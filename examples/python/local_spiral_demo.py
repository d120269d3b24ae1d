"""Local Spiral demo (reference examples/node-local): start the PIR server
in-process, write keys, and read one back privately.

Run: python examples/python/local_spiral_demo.py
"""

import json
import socket
import sys

sys.path.insert(0, ".")


def main():
    from sdk_tpu.clients.bucket_service import connect_local
    from sdk_tpu.params import get_fast_expansion_testing_params, params_to_json_obj
    from sdk_tpu.server.http import serve
    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_fast_expansion_testing_params()
    srv = SpiralKvServer(params, json.dumps(params_to_json_obj(params)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    serve(srv, port, block=False)
    print(f"server on :{port} — {params.num_items()} rows x "
          f"{params.item_size()} bytes")

    bucket = connect_local(port)
    bucket.write({
        "Ada Lovelace": b"first programmer",
        "Grace Hopper": b"compiler pioneer",
        "Katherine Johnson": b"orbital mechanics",
    })
    print("wrote 3 keys")

    value = bucket.private_read(["Grace Hopper"])[0]
    print(f"privately read 'Grace Hopper' -> {value!r}")
    assert value == b"compiler pioneer"

    missing = bucket.private_read(["Alan Turing"])[0]
    print(f"privately read 'Alan Turing' -> {missing!r} (not present)")


if __name__ == "__main__":
    main()

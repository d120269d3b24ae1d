"""Multi-host DCN serving demo: two backend servers each holding half the
Spiral instances, one front end splicing responses (sdk_tpu.server.dcn).

Run:  python examples/python/dcn_demo.py
(CPU by default so it runs anywhere; drop SDK_TPU_FORCE_CPU for TPU backends.)
"""

import json
import os
import socket
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("SDK_TPU_FORCE_CPU", "1")

import jax  # noqa: E402

if os.environ.get("SDK_TPU_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from sdk_tpu.params import params_from_json, params_from_json_obj  # noqa: E402
from sdk_tpu.server.dcn import DcnFrontend, backend_params_obj, serve as dcn_serve  # noqa: E402
from sdk_tpu.server.http import serve as http_serve  # noqa: E402
from sdk_tpu.server.kv_server import SpiralKvServer  # noqa: E402

PARAMS_JSON = ('{"n": 2, "nu_1": 6, "nu_2": 2, "p": 256, "q2_bits": 20,'
               ' "t_gsw": 8, "t_conv": 4, "t_exp_left": 8, "t_exp_right": 8,'
               ' "instances": 2, "db_item_size": 16384}')


def free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main():
    params = params_from_json(PARAMS_JSON)
    b_obj = backend_params_obj(params, 2)
    urls = []
    for i in range(2):
        port = free_port()
        http_serve(SpiralKvServer(params_from_json_obj(b_obj)), port,
                   block=False)
        urls.append(f"http://localhost:{port}")
        print(f"backend {i}: {urls[-1]} (instances={b_obj['instances']})")

    fe_port = free_port()
    dcn_serve(DcnFrontend(params, urls, PARAMS_JSON), fe_port, block=False)
    print(f"front end: http://localhost:{fe_port} "
          f"(instances={params.instances} over {len(urls)} hosts)")

    from sdk_tpu.clients.bucket_service import connect_local

    bucket = connect_local(fe_port)
    print("meta:", json.dumps({k: bucket.info()[k]
                               for k in ("dcn_backends", "global_version")}))
    bucket.write({"Ohio": b"Columbus", "California": b"Sacramento"})
    print("wrote 2 keys (rows spliced+compressed at the front end, "
          "instance slices shipped to each backend)")
    got = bucket.private_read(["California"])
    print("private read California ->", got[0])
    assert got == [b"Sacramento"]
    print("OK: response spliced from per-host instance segments, "
          "decoded bit-exactly")


if __name__ == "__main__":
    main()

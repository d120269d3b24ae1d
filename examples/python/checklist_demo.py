"""DoublePIR checklist demo (reference examples browser checklist flow):
a private password-breach check — the server never learns which password
was checked.

Run: python examples/python/checklist_demo.py
"""

import socket
import sys

sys.path.insert(0, ".")


def main():
    from sdk_tpu.clients.api import API
    from sdk_tpu.clients.bucket import Bucket
    from sdk_tpu.server.doublepir_server import (DoublePirKvServer,
                                                 serve_doublepir)

    srv = DoublePirKvServer(log2m=16)
    srv.add_keys(["hunter2", "password123", "letmein"])
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    serve_doublepir(srv, port, block=False)
    print(f"checklist server on :{port} (bloom of 2^16 bits)")

    bucket = Bucket(API("", f"http://localhost:{port}"))
    for pw in ["hunter2", "correct horse battery staple"]:
        breached = bucket.check_inclusion(pw)
        print(f"  {pw!r}: {'BREACHED' if breached else 'ok'}")


if __name__ == "__main__":
    main()

"""HTTP front end: the reference server's six routes on stdlib http.server
(reference lib/server/src/bin/server.rs:31-187).

Routes:
    GET  /              hello
    GET  /meta          bucket metadata incl. pir_scheme params + version
    POST /setup         store client public params, return {"uuid": ...}
    POST /write         JSON {key: base64 value | null}
    POST /update-row    raw row chunks (u32 len BE | u32 idx BE | bytes)*
    POST /private-read  JSON list of base64 queries -> JSON list of base64

Usage: python -m sdk_tpu.server.http <port> [params.json | num_items_log2 item_size]
"""

from __future__ import annotations

import gzip
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..params import Params, params_from_json
from .kv_server import SpiralKvServer


def make_handler(srv: SpiralKvServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> bytes:
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            if self.headers.get("Content-Encoding") == "gzip":
                data = gzip.decompress(data)
            return data

        def do_GET(self):
            path = self.path.rstrip("/") or "/"
            if path == "/":
                self._send(200, f"Hello {srv.params.poly_len}!".encode(),
                           "text/plain")
            elif path == "/meta" or path.endswith("/meta"):
                self._send(200, json.dumps(srv.meta()).encode())
            elif path.endswith("/metrics"):
                self._send(200, json.dumps(srv.metrics()).encode())
            elif path.endswith("/check"):
                # /<uuid>/check — does the server hold this client's params
                uid = path.split("/")[1]
                self._send(200, json.dumps({"found": srv.has_uuid(uid)}).encode())
            elif path.endswith("/bloom"):
                import base64 as _b64
                try:
                    self._send(200, json.dumps(
                        {"bloom": _b64.b64encode(srv.bloom_bytes()).decode()}
                    ).encode())
                except KeyError:
                    self._send(404, b'{"error": "no bloom filter"}')
            elif path.endswith("/list-keys"):
                try:
                    self._send(200, json.dumps(srv.list_keys()).encode())
                except KeyError:
                    self._send(404, b'{"error": "key storage not enabled"}')
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            path = self.path.rstrip("/")
            try:
                body = self._body()
                if path.endswith("/setup"):
                    uid = srv.setup(body)
                    self._send(200, json.dumps({"uuid": uid}).encode())
                elif path.endswith("/write"):
                    resp = srv.write_kv(body)
                    self._send(200, json.dumps(resp).encode())
                elif path.endswith("/update-row"):
                    largest = srv.update_many_items(body)
                    self._send(200, json.dumps(
                        {"status": "done updating",
                         "largest_update": largest}).encode())
                elif path.endswith("/private-read"):
                    self._send(200, srv.private_read(body))
                elif path.endswith("/clear"):
                    srv.clear()
                    self._send(200, b'{"status": "cleared"}')
                else:
                    self._send(404, b'{"error": "not found"}')
            except KeyError:
                self._send(404, b'{"error": "unknown uuid"}')
            except Exception as e:  # noqa: BLE001 — surface to client
                self._send(500, json.dumps({"error": str(e)}).encode())

    return Handler


def serve(srv: SpiralKvServer, port: int, block: bool = True):
    httpd = ThreadingHTTPServer(("localhost", port), make_handler(srv))
    if block:
        print(f"Listening on {port}", flush=True)
        httpd.serve_forever()
    else:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
    return httpd


DEFAULT_CFG = """{
    "n": 2, "nu_1": 9, "nu_2": 5, "p": 256, "q2_bits": 22,
    "t_gsw": 7, "t_conv": 3, "t_exp_left": 5, "t_exp_right": 5,
    "instances": 4, "db_item_size": 32768
}"""


def enable_jit_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache: the serving pipelines take minutes
    to compile cold; cache across restarts."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      path or "/tmp/sdk_tpu_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main(argv: list[str]):
    import os

    if os.environ.get("SDK_TPU_FORCE_CPU"):
        # the axon TPU plugin overrides JAX_PLATFORMS env; force via config
        import jax

        jax.config.update("jax_platforms", "cpu")
    enable_jit_cache()
    port = int(argv[1]) if len(argv) > 1 else 8008
    if len(argv) == 4:
        from ..params_store import get_params_from_store
        params = get_params_from_store(int(argv[2]), int(argv[3]))
        params_json = None
    elif len(argv) == 3:
        with open(argv[2]) as f:
            params_json = f.read()
        params = params_from_json(params_json)
    else:
        params_json = DEFAULT_CFG
        params = params_from_json(params_json)
    srv = SpiralKvServer(params, params_json)
    serve(srv, port)


if __name__ == "__main__":
    main(sys.argv)


def cli():
    main(sys.argv)

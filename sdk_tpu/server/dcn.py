"""Multi-host DCN serving: shard Spiral `instances` across backend servers.

The reference's instances are fully independent until response
concatenation (lib/server/src/server.rs:53-96 iterates instances*trials and
encode packs per-instance blocks back to back, server.rs:101-134). That
makes instance sharding the natural DCN axis (SURVEY §2.8): each backend
host runs an ordinary single-bucket server (sdk_tpu.server.http) holding
1/N of the instances — on its own TPU mesh — and a stateless-compute front
end owns the KV plane and splices per-instance response segments.

Topology:
    client ── front end (this module: rows, bloom, routing)
                ├── backend 0: instances [0, I/N)      (own chips / host)
                ├── backend 1: instances [I/N, 2I/N)
                └── ...

Data flow:
 - /write: the front end splices + bzip2-compresses full rows (the KV layer
   must see whole rows), zero-pads to instances*n^2*bytes_per_chunk, and
   sends each backend its instance slice as a raw /update-row body.
 - /setup: forwarded to every backend under one front-end-chosen uuid.
 - /private-read: the query blob is fanned out concurrently; each backend
   expands/scans/folds/packs its instance slice; the front end concatenates
   the per-instance byte segments (each is byte-aligned: poly_len=2048
   makes every field group a multiple of 8 bits) and re-pads.

Note the expansion is recomputed per host (unlike the single-node engine
where all instances share one expansion) — the price of zero cross-host
state, as in the reference's chunked DoublePIR e2e (bin/e2e.rs:60-106).

Usage:
  python -m sdk_tpu.server.dcn <port> <params.json> <backend_url>...
  python -m sdk_tpu.server.dcn <port> <params.json> --spawn N
      (spawns N local backend subprocesses — the CI/demo topology)
"""

from __future__ import annotations

import base64
import json
import sys
import threading
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..arith import log2_ceil
from ..kv.key_value import row_from_key
from ..kv.write import compress_row, unwrap_kv_pairs, update_row
from ..params import Params, params_from_json, params_to_json_obj
from .http import parse_multipart_file


def backend_params_obj(params: Params, num_backends: int) -> dict:
    """The params each backend serves: instances/N of the full config, with
    db_item_size scaled so bytes_per_chunk is unchanged."""
    assert params.instances % num_backends == 0, (
        f"instances {params.instances} not divisible by {num_backends}")
    obj = params_to_json_obj(params)
    obj["instances"] = params.instances // num_backends
    obj["db_item_size"] = params.instances * params.n * params.n * \
        params.bytes_per_chunk() // num_backends
    return obj


def response_segment_bytes(params: Params) -> int:
    """Bit-exact size of one instance's encoded response segment
    (encode_response packs q2_bits*n*z + q1_bits*n^2*z bits per instance,
    ops/server_jax.py:290-300); always byte-aligned for poly_len=2048."""
    q1_bits = log2_ceil(4 * params.pt_modulus)
    bits = (params.q2_bits * params.n * params.poly_len
            + q1_bits * params.n * params.n * params.poly_len)
    assert bits % 8 == 0
    return bits // 8


class DcnFrontend:
    """KV plane + instance-shard router over HTTP backends."""

    def __init__(self, params: Params, backend_urls: list[str],
                 params_json: str | None = None,
                 key_storage_policy: str = "bloom"):
        self.params = params
        self.params_json = params_json or json.dumps(params_to_json_obj(params))
        self.urls = [u.rstrip("/") for u in backend_urls]
        self.inst_per = params.instances // len(self.urls)
        backend_params_obj(params, len(self.urls))  # validates divisibility
        self.rows: list[bytearray] = [bytearray()
                                      for _ in range(params.num_items())]
        self.name = ""
        self.destroyed = False
        self.version = 0
        self.lock = threading.RLock()
        self.key_storage_policy = key_storage_policy
        self._stored_keys: set[str] = set()
        self._key_bloom = None
        if key_storage_policy in ("bloom", "full"):
            from ..clients.bloom import BloomFilter

            bits = params.db_dim_1 + params.db_dim_2 + 6
            self._key_bloom = BloomFilter.empty(8, bits)
        self._pool = ThreadPoolExecutor(max_workers=max(4, len(self.urls)))

    # --- backend I/O ---

    def _post(self, url: str, path: str, data: bytes) -> bytes:
        req = urllib.request.Request(
            url + path, data=data,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            return r.read()

    def _fanout(self, path: str, data: bytes) -> list[bytes]:
        futs = [self._pool.submit(self._post, u, path, data)
                for u in self.urls]
        return [f.result() for f in futs]

    # --- writes (front end owns the KV layer; backends get raw slices) ---

    def write_kv(self, body: bytes) -> dict:
        import time as _time

        t0 = _time.time()
        with self.lock:
            kv_pairs = unwrap_kv_pairs(body)
            by_row: dict[int, list] = {}
            for k, v in kv_pairs:
                by_row.setdefault(
                    row_from_key(len(self.rows), k), []).append((k, v))
            for row_id in sorted(by_row):
                for k, v in by_row[row_id]:
                    update_row(self.rows[row_id], k, v)
                    if v and self._key_bloom is not None:
                        self._key_bloom.insert(k)
                    if v and self.key_storage_policy == "full":
                        self._stored_keys.add(k)
                    elif not v:
                        self._stored_keys.discard(k)
                self._send_row(row_id, compress_row(self.rows[row_id]))
            self.version += 1
        return {"status": "done updating",
                "loading_time_us": int((_time.time() - t0) * 1e6)}

    def _send_row(self, db_idx: int, data: bytes) -> None:
        params = self.params
        trials = params.n * params.n
        bpc = params.bytes_per_chunk()
        full = params.instances * trials * bpc
        if len(data) > full:
            raise ValueError(f"row {db_idx} too large: {len(data)} > {full}")
        padded = bytes(data) + bytes(full - len(data))
        seg = self.inst_per * trials * bpc
        for b, url in enumerate(self.urls):
            chunk = padded[b * seg:(b + 1) * seg]
            body = (len(chunk) + 4).to_bytes(4, "big") + \
                db_idx.to_bytes(4, "big") + chunk
            self._pool.submit(self._post, url, "/update-row", body).result()

    def update_item(self, body: bytes) -> None:
        db_idx = int.from_bytes(body[:4], "big")
        if db_idx >= self.params.num_items():
            raise ValueError(f"bad db idx {db_idx}")
        self._send_row(db_idx, body[4:])

    def update_many_items(self, body: bytes) -> int:
        offs, largest = 0, 0
        with self.lock:
            while offs < len(body):
                chunk_len = int.from_bytes(body[offs:offs + 4], "big")
                data = body[offs + 4:offs + 4 + chunk_len]
                largest = max(largest, len(data))
                self.update_item(data)
                offs += 4 + chunk_len
        return largest

    # --- setup / read ---

    def setup(self, body: bytes) -> str:
        import uuid as uuidlib

        uid = str(uuidlib.uuid4())
        self.setup_raw(base64.b64decode(json.loads(body)), uid)
        return uid

    def setup_raw(self, raw: bytes, uid: str) -> str:
        body = json.dumps(base64.b64encode(raw).decode()).encode()
        futs = [self._pool.submit(self._post, u, f"/setup?uuid={uid}", body)
                for u in self.urls]
        for f in futs:
            f.result()
        return uid

    def has_uuid(self, uid: str) -> bool:
        for u in self.urls:
            try:
                req = urllib.request.Request(f"{u}/{uid}/check")
                with urllib.request.urlopen(req) as r:
                    if not json.loads(r.read()).get("found", False):
                        return False
            except Exception:  # noqa: BLE001
                return False
        return True

    def private_read(self, body: bytes) -> bytes:
        """Fan the query batch out; splice per-instance response segments."""
        params = self.params
        results = self._fanout("/private-read", body)
        lists = [json.loads(r) for r in results]
        nq = len(lists[0])
        seg = response_segment_bytes(params)
        valid_per_backend = self.inst_per * seg
        total_bits = params.instances * seg * 8
        full_bytes = ((total_bits + 63) // 64) * 8
        out = []
        for i in range(nq):
            parts = [base64.b64decode(lst[i])[:valid_per_backend]
                     for lst in lists]
            joined = b"".join(parts)
            joined += bytes(full_bytes - len(joined))
            out.append(base64.b64encode(joined).decode())
        return json.dumps(out).encode()

    # --- admin / metadata ---

    def clear(self) -> None:
        with self.lock:
            for r in self.rows:
                r.clear()
            self._stored_keys.clear()
            if self._key_bloom is not None:
                from ..clients.bloom import BloomFilter

                self._key_bloom = BloomFilter.empty(
                    self._key_bloom.k, self._key_bloom.bits)
            self._fanout("/clear", b"{}")
            self.version += 1

    def destroy(self) -> None:
        with self.lock:
            self.clear()
            self._fanout("/destroy", b"")
            self.destroyed = True

    def rename(self, new_name: str) -> None:
        self.name = new_name

    def bloom_bytes(self) -> bytes:
        if self._key_bloom is None:
            raise KeyError("bloom")
        return self._key_bloom.to_bytes()

    def list_keys(self) -> list[str]:
        if self.key_storage_policy != "full":
            raise KeyError("list-keys")
        return sorted(self._stored_keys)

    def meta(self) -> dict:
        return {
            "id": 0,
            "name": self.name,
            "owner_id": 0,
            "open_access": True,
            "pir_scheme": json.loads(self.params_json),
            "global_version": self.version,
            "dcn_backends": len(self.urls),
        }

    def metrics(self) -> dict:
        return {"version": self.version,
                "num_rows_populated": sum(1 for r in self.rows if r),
                "backends": self.urls}


def make_handler(fe: DcnFrontend):
    """Same route surface as sdk_tpu.server.http, served by the router."""
    pending_uploads: dict[str, dict] = {}

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):
            pass

        def _send(self, code: int, body: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> bytes:
            import gzip

            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            if self.headers.get("Content-Encoding") == "gzip":
                data = gzip.decompress(data)
            return data

        def do_GET(self):
            path = self.path.rstrip("/") or "/"
            if fe.destroyed and path != "/":
                self._send(404, b'{"error": "bucket destroyed"}')
                return
            if path == "/":
                self._send(200, f"Hello {fe.params.poly_len}!".encode(),
                           "text/plain")
            elif path.endswith("/meta"):
                self._send(200, json.dumps(fe.meta()).encode())
            elif path.endswith("/metrics"):
                self._send(200, json.dumps(fe.metrics()).encode())
            elif path.endswith("/check"):
                uid = path.split("/")[1]
                self._send(200, json.dumps(
                    {"found": fe.has_uuid(uid)}).encode())
            elif path.endswith("/bloom"):
                try:
                    self._send(200, json.dumps(
                        {"bloom": base64.b64encode(fe.bloom_bytes()).decode()}
                    ).encode())
                except KeyError:
                    self._send(404, b'{"error": "no bloom filter"}')
            elif path.endswith("/list-keys"):
                try:
                    self._send(200, json.dumps(fe.list_keys()).encode())
                except KeyError:
                    self._send(404, b'{"error": "key storage not enabled"}')
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            path, _, qs = self.path.partition("?")
            path = path.rstrip("/")
            if fe.destroyed:
                self._send(404, b'{"error": "bucket destroyed"}')
                return
            try:
                body = self._body()
                if path.endswith("/setup"):
                    forced_uid = None
                    for kv in qs.split("&"):
                        if kv.startswith("uuid="):
                            forced_uid = kv[5:]
                    prelim = None
                    if len(body) < 1024 and forced_uid is None:
                        try:
                            parsed = json.loads(body)
                            if isinstance(parsed, dict) and "length" in parsed:
                                prelim = parsed
                        except ValueError:
                            pass
                    if prelim is not None:
                        # presigned-upload flow (reference api.rs:149-186)
                        import uuid as _uuid

                        uid = str(_uuid.uuid4())
                        token = _uuid.uuid4().hex
                        pending_uploads[token] = {
                            "uuid": uid, "length": int(prelim["length"])}
                        self._send(200, json.dumps({
                            "uuid": uid, "url": f"/upload/{token}",
                            "fields": {"key": token}}).encode())
                    elif forced_uid is not None:
                        uid = fe.setup_raw(base64.b64decode(json.loads(body)),
                                           forced_uid)
                        self._send(200, json.dumps({"uuid": uid}).encode())
                    else:
                        uid = fe.setup(body)
                        self._send(200, json.dumps({"uuid": uid}).encode())
                elif "/upload/" in path:
                    token = path.rsplit("/", 1)[1]
                    slot = pending_uploads.pop(token, None)
                    if slot is None:
                        self._send(404, b'{"error": "unknown upload token"}')
                        return
                    raw = parse_multipart_file(
                        self.headers.get("Content-Type", ""), body)
                    if len(raw) != slot["length"]:
                        self._send(400, json.dumps(
                            {"error": "upload length mismatch"}).encode())
                        return
                    fe.setup_raw(raw, slot["uuid"])
                    self._send(200, json.dumps(
                        {"uuid": slot["uuid"]}).encode())
                elif path.endswith("/write"):
                    self._send(200, json.dumps(fe.write_kv(body)).encode())
                elif path.endswith("/update-row"):
                    largest = fe.update_many_items(body)
                    self._send(200, json.dumps(
                        {"status": "done updating",
                         "largest_update": largest}).encode())
                elif path.endswith("/private-read"):
                    self._send(200, fe.private_read(body))
                elif path.endswith("/clear"):
                    fe.clear()
                    self._send(200, b'{"status": "cleared"}')
                elif path.endswith("/modify"):
                    fe.rename(json.loads(body)["name"])
                    self._send(200, b'{"status": "modified"}')
                elif path.endswith("/destroy"):
                    fe.destroy()
                    self._send(200, b'{"status": "destroyed"}')
                else:
                    self._send(404, b'{"error": "not found"}')
            except KeyError:
                self._send(404, b'{"error": "unknown uuid"}')
            except Exception as e:  # noqa: BLE001
                self._send(500, json.dumps({"error": str(e)}).encode())

    return Handler


def serve(fe: DcnFrontend, port: int, block: bool = True):
    httpd = ThreadingHTTPServer(("localhost", port), make_handler(fe))
    if block:
        print(f"Listening on {port}", flush=True)
        httpd.serve_forever()
    else:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


def spawn_backends(params: Params, n: int, base_port: int,
                   env_extra: dict | None = None):
    """Spawn n local backend subprocesses (the CI/demo topology; production
    points at remote hosts instead). Returns (urls, procs)."""
    import os
    import subprocess
    import tempfile
    import time

    obj = backend_params_obj(params, n)
    f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
    json.dump(obj, f)
    f.close()
    urls, procs = [], []
    for b in range(n):
        port = base_port + b
        env = dict(os.environ)
        env.update(env_extra or {})
        proc = subprocess.Popen(
            [sys.executable, "-m", "sdk_tpu.server.http", str(port), f.name],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            env=env)
        procs.append(proc)
        urls.append(f"http://localhost:{port}")
    for proc in procs:
        deadline = time.time() + 600
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "Listening on" in line:
                break
        else:
            raise RuntimeError("backend did not start")
    return urls, procs


def main(argv: list[str]):
    import os

    if os.environ.get("SDK_TPU_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    port = int(argv[1])
    with open(argv[2]) as fjson:
        params_json = fjson.read()
    params = params_from_json(params_json)
    rest = argv[3:]
    if rest and rest[0] == "--spawn":
        n = int(rest[1])
        urls, _procs = spawn_backends(params, n, port + 1)
        print(f"Spawned {n} backends: {urls}", flush=True)
    else:
        urls = rest
    fe = DcnFrontend(params, urls, params_json)
    serve(fe, port)


if __name__ == "__main__":
    main(sys.argv)

"""HTTP load test: M concurrent clients hammering /private-read.

Exercises the FULL serving stack under concurrency — ThreadingHTTPServer,
the ReadCoalescer's pipelined windows (http.py), the two-phase
dispatch/fetch split, and reads racing donating writes — the load shape
the reference serves with actix workers (reference
lib/server/src/bin/server.rs:31-187) but measured here end-to-end with
decode verification on every response.

Each client thread owns a real Bucket (its own keys, its own /setup),
loops `private_read` on randomly chosen seeded keys until the deadline,
and byte-verifies every decode against the deterministic gold value.
An optional writer thread interleaves /write traffic so index flushes
(which DONATE the device DB buffer) race the reads, like production.

Usage:
    # spawn a local server (tiny params, CPU) and load it
    python tools/load_test.py --clients 8 --duration 10 --window-ms 5

    # target an already-running server (e.g. TPU-backed, warmed)
    python tools/load_test.py --endpoint http://localhost:8008 \
        --clients 16 --duration 30

Prints one JSON summary line: qps, latency percentiles, error count,
and the server's read_coalescer stats (mean coalesced batch size shows
whether concurrency actually batched).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import random
import signal
import socket
import subprocess
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def key_to_gold_value(key: str, size: int = 64) -> bytes:
    """Deterministic key -> value (same scheme as test_live_service.py)."""
    out = bytearray()
    cur = key.encode()
    while len(out) < size:
        cur = hashlib.sha256(cur).digest()
        out.extend(cur)
    return bytes(out[:size])


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def spawn_server(window_ms: float, cpu: bool, params_file: str | None,
                 warmup: bool) -> tuple[subprocess.Popen, int]:
    """Spawn python -m sdk_tpu.server.http and wait for 'Listening on'."""
    import tempfile

    port = _free_port()
    if params_file is None:
        from sdk_tpu.params import (get_fast_expansion_testing_params,
                                    params_to_json_obj)

        f = tempfile.NamedTemporaryFile(
            "w", suffix=".json", delete=False, prefix="loadtest_params_")
        json.dump(params_to_json_obj(get_fast_expansion_testing_params()), f)
        f.close()
        params_file = f.name
    env = dict(os.environ)
    if cpu:
        env["JAX_PLATFORMS"] = "cpu"
        env["SDK_TPU_FORCE_CPU"] = "1"
    cmd = [sys.executable, "-m", "sdk_tpu.server.http", str(port),
           params_file, "--batch-window-ms", str(window_ms)]
    if warmup:
        cmd.append("--warmup")
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True, env=env,
                            cwd=REPO)
    deadline = time.time() + 600
    while time.time() < deadline:
        line = proc.stdout.readline()
        if "Listening on" in line:
            return proc, port
    proc.kill()
    raise RuntimeError("server did not start within 600s")


def run_load(endpoint: str, clients: int, duration_s: float,
             keys_per_read: int = 1, n_keys: int = 32,
             writer: bool = False, seed: int = 0) -> dict:
    """Drive `clients` concurrent reader threads for `duration_s`; return
    the summary dict (also usable from tests)."""
    from sdk_tpu.clients.bucket_service import BucketService

    svc = BucketService("", endpoint)
    seed_bucket = svc.connect("")
    keys = [f"load-{seed}-{i}" for i in range(n_keys)]
    seed_bucket.write({k: key_to_gold_value(k) for k in keys})

    latencies_by_client: list[list[float]] = [[] for _ in range(clients)]
    errors: list[str] = []
    err_lock = threading.Lock()
    start_barrier = threading.Barrier(clients + (1 if writer else 0) + 1)
    stop = threading.Event()

    def reader(idx: int):
        rng = random.Random(seed * 1000 + idx)
        b = BucketService("", endpoint).connect("")
        b.setup()  # each client its own uuid — the production shape
        start_barrier.wait()
        lat = latencies_by_client[idx]
        while not stop.is_set():
            batch = rng.sample(keys, keys_per_read)
            t0 = time.perf_counter()
            try:
                got = b.private_read(batch)
            except Exception as e:  # noqa: BLE001 — recorded, not fatal
                with err_lock:
                    errors.append(f"reader{idx}: {e!r}")
                continue
            lat.append(time.perf_counter() - t0)
            want = [key_to_gold_value(k) for k in batch]
            if got != want:
                with err_lock:
                    errors.append(f"reader{idx}: decode mismatch on {batch}")

    def writer_loop():
        rng = random.Random(seed + 777)
        start_barrier.wait()
        i = 0
        while not stop.is_set():
            # churn a disjoint key range so reads stay verifiable while
            # flushes donate the device DB buffer under the readers
            k = f"churn-{seed}-{rng.randrange(8)}"
            try:
                seed_bucket.write({k: key_to_gold_value(k + str(i))})
            except Exception as e:  # noqa: BLE001
                with err_lock:
                    errors.append(f"writer: {e!r}")
            i += 1
            time.sleep(0.05)

    threads = [threading.Thread(target=reader, args=(i,), daemon=True)
               for i in range(clients)]
    if writer:
        threads.append(threading.Thread(target=writer_loop, daemon=True))
    for t in threads:
        t.start()
    start_barrier.wait()  # everyone set up; measurement window starts now
    t_start = time.perf_counter()
    time.sleep(duration_s)
    stop.set()
    for t in threads:
        t.join(timeout=120)
    elapsed = time.perf_counter() - t_start

    lats = sorted(x for ls in latencies_by_client for x in ls)
    n_reads = len(lats)

    def pct(p: float) -> float:
        return lats[min(n_reads - 1, int(p * n_reads))] if lats else float("nan")

    coalescer = {}
    try:
        with urllib.request.urlopen(f"{endpoint}/metrics", timeout=30) as r:
            coalescer = json.load(r).get("read_coalescer", {})
    except Exception:  # noqa: BLE001 — metrics are best-effort
        pass
    return {
        "clients": clients,
        "duration_s": round(elapsed, 3),
        "reads": n_reads,
        "queries": n_reads * keys_per_read,
        "qps": round(n_reads * keys_per_read / elapsed, 2) if elapsed else 0,
        "latency_ms": {"p50": round(pct(0.50) * 1e3, 2),
                       "p90": round(pct(0.90) * 1e3, 2),
                       "p99": round(pct(0.99) * 1e3, 2)},
        "errors": len(errors),
        "error_samples": errors[:5],
        "read_coalescer": coalescer,
        "mean_coalesced_batch": round(
            coalescer.get("requests", 0) / coalescer["batches"], 2)
        if coalescer.get("batches") else None,
    }


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--endpoint", default="",
                    help="target an existing server; else spawn one locally")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--keys-per-read", type=int, default=1)
    ap.add_argument("--n-keys", type=int, default=32)
    ap.add_argument("--window-ms", type=float, default=5.0,
                    help="coalescer window for the spawned server")
    ap.add_argument("--params-file", default=None,
                    help="params JSON for the spawned server "
                         "(default: tiny fast-expansion test params)")
    ap.add_argument("--writer", action="store_true",
                    help="interleave a background writer (flushes race reads)")
    ap.add_argument("--tpu", action="store_true",
                    help="spawned server uses the real device (default CPU)")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args(argv)

    proc = None
    endpoint = args.endpoint
    try:
        if not endpoint:
            proc, port = spawn_server(args.window_ms, cpu=not args.tpu,
                                      params_file=args.params_file,
                                      warmup=not args.no_warmup)
            endpoint = f"http://localhost:{port}"
            print(f"spawned server at {endpoint}", file=sys.stderr)
        summary = run_load(endpoint, args.clients, args.duration,
                           keys_per_read=args.keys_per_read,
                           n_keys=args.n_keys, writer=args.writer)
        print(json.dumps(summary))
        return summary
    finally:
        if proc is not None:
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                proc.kill()


if __name__ == "__main__":
    main()

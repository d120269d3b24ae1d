"""Split the batch16 full-protocol time (bench.py spiral_batch16) into
host-prep / device / fetch at the production 1 GiB shape.

BENCH_r03: 959 ms per 16-query batch vs ~620 ms of accounted device work
(fold ~555 + scan ~21 + expand + pack) — this tool finds the rest.

Phases measured:
  parse     16x Query.deserialize + session lookup (host)
  dispatch  host time to trace/enqueue the fused program (async return)
  e2e       full private_read_blobs wall time (the bench's number)
  device    k-loop differenced device time of the fused batched program
            (k chained executions inside one dispatch; RTT cancels)

Usage: python tools/profile_batch16.py [--nq 16] [--iters 5]
"""

from __future__ import annotations

import base64
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

NQ = int(sys.argv[sys.argv.index("--nq") + 1]) if "--nq" in sys.argv else 16
ITERS = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 5
LAYOUT = (sys.argv[sys.argv.index("--layout") + 1]
          if "--layout" in sys.argv else "throughput")


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/sdk_tpu_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from sdk_tpu.client import Client, Query
    from sdk_tpu.kv.key_value import row_from_key
    from sdk_tpu.params_store import get_params_from_store
    from sdk_tpu.rng import ChaCha20Rng
    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_params_from_store(15, 32768)
    print(f"nq={NQ} dense_layout={LAYOUT}", flush=True)
    srv = SpiralKvServer(params, dense_layout=LAYOUT)
    srv.dense_migrate_fill = -1.0
    value = bytes(range(256)) * 64
    srv.write_kv(json.dumps(
        {"bench-key": base64.b64encode(value).decode()}).encode())
    row = row_from_key(params.num_items(), "bench-key")

    clients, blobs = [], []
    for ci in range(4):
        c = Client(params)
        pp = c.generate_keys_from_seed(
            bytes([0x50 + ci]) * 32,
            noise_rng=ChaCha20Rng(bytes([0x60 + ci]) * 32),
            pp_seed=bytes([0x70 + ci]) * 32)
        uid = srv.setup_raw(pp.serialize(params))
        clients.append(c)
        for qi in range(NQ // 4):
            q = c.generate_query(
                row, noise_rng=ChaCha20Rng(bytes([0x80 + 4 * ci + qi]) * 32),
                query_seed=bytes([0xA0 + 4 * ci + qi]) * 32)
            blobs.append(uid.encode() + q.serialize(params))
    blobs = blobs[:NQ]

    # warm the fused batched program
    srv.private_read_blobs(blobs)

    # --- e2e (the bench's measurement) ---
    for name, reps in (("e2e", ITERS),):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            srv.private_read_blobs(blobs)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{name:9s} p50 {ts[len(ts)//2]*1e3:8.1f} ms  "
              f"(min {ts[0]*1e3:.1f})", flush=True)

    # --- parse (host) ---
    t0 = time.perf_counter()
    for _ in range(ITERS):
        reqs = [srv._parse_request(b) for b in blobs]
    parse = (time.perf_counter() - t0) / ITERS
    print(f"parse     {parse*1e3:8.1f} ms", flush=True)

    # --- dispatch (host enqueue; async) + fetch split ---
    ts_d, ts_f = [], []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        with srv.lock:
            fetch = srv.engine.dispatch_queries_batched(reqs)
        t1 = time.perf_counter()
        fetch()
        t2 = time.perf_counter()
        ts_d.append(t1 - t0)
        ts_f.append(t2 - t1)
    ts_d.sort(); ts_f.sort()
    print(f"dispatch  {ts_d[len(ts_d)//2]*1e3:8.1f} ms  (host enqueue)",
          flush=True)
    print(f"fetch     {ts_f[len(ts_f)//2]*1e3:8.1f} ms  "
          f"(device run + transfer)", flush=True)

    # --- pure device time of the fused program: k-loop differenced ---
    # (works for both the dense and the sparse-expansion batched programs —
    # the bench's single-planted-row bucket installs a SparseExpansionPlan,
    # so the sparse variant is what the batch16 metric actually runs)
    eng = srv.engine
    pps = [r[0] for r in reqs]
    queries = [r[1] for r in reqs]

    def stack_key(key):
        return jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[pp[key] for pp in pps])

    ct_pairs = [q.ct for q in queries]
    from sdk_tpu.ops.server_jax import _split_pair_np

    hi = np.stack([_split_pair_np(ct)[0] for ct in ct_pairs])
    lo = np.stack([_split_pair_np(ct)[1] for ct in ct_pairs])
    keys = {k: stack_key(k) for k in
            ("v_exp_left", "v_exp_right", "v_conversion", "v_packing")}
    sched = eng._splan_dev if eng._splan is not None else ()
    impl = (eng._full_batched_sparse_impl if sched
            else eng._full_batched_impl)
    print(f"program   {'sparse' if sched else 'dense'} expansion",
          flush=True)

    @functools.partial(jax.jit, static_argnums=4)
    def run_k(db, h, l, keys, k):
        def body(i, acc):
            # +i defeats CSE across chained rounds (values stay valid u32;
            # only timing matters here)
            words = impl(
                db, h + i.astype(jnp.uint32), l,
                keys["v_exp_left"], keys["v_exp_right"],
                keys["v_conversion"], keys["v_packing"], *sched)
            return acc + words.sum(dtype=jnp.uint32)

        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    h_dev, l_dev = jnp.asarray(hi), jnp.asarray(lo)

    def t_of(k):
        int(run_k(eng.db, h_dev, l_dev, keys, k))
        best = 1e9
        for _ in range(ITERS):
            t0 = time.perf_counter()
            int(run_k(eng.db, h_dev, l_dev, keys, k))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t3 = t_of(1), t_of(3)
    dev = (t3 - t1) / 2
    print(f"device    {dev*1e3:8.1f} ms  (k-loop differenced fused batch)",
          flush=True)

    # --- response transfer: the fetch minus the device run ---
    # words_all for the batch is NQ x words; time dispatch+fetch of the
    # real program once more and subtract the device time above
    with srv.lock:
        fetch = srv.engine.dispatch_queries_batched(reqs)
    t0 = time.perf_counter()
    fetch()
    total = time.perf_counter() - t0
    resp_bytes = NQ * srv.engine._encode_plan.num_bytes
    print(f"transfer  {max(total - dev, 0)*1e3:8.1f} ms  "
          f"(fetch {total*1e3:.1f} - device {dev*1e3:.1f}; "
          f"{resp_bytes} resp bytes)", flush=True)


if __name__ == "__main__":
    main()

"""Benchmarks for every BASELINE.json target, on the real TPU chip.

Prints ONE JSON line per metric:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
in order (the HEADLINE p50 runs FIRST: the round-3 driver run hit its
overall wall-clock budget before the last metric — rc=124 with the p50
line missing — so the most important metric now cannot be starved):
  1. spiral_p50_1gib — the headline: full-protocol p50 latency on the
     1 GiB bucket (2^15 x 32 KiB, params-store (9,6) v1 config =
     reference bin/server.rs:191-203 scaled up one nu_2), decode verified
     bit-exact each iteration.
  2. spiral_batch16_full_protocol — ms per 16-query full-protocol batch
     (4 client sessions x 4 queries; one fused scan+fold, one vmapped
     pack+encode dispatch — the coalescer's serving pattern). Cold-start
     single-batch LATENCY: dispatch + device + response transfer serial.
  3. spiral_sustained_qps (NEW r5) — steady-state serving rate: 6
     back-to-back batch-16 reads through the depth-2 dispatch/fetch
     pipeline (transfer/RTT overlap device compute), all decodes verified.
  4. doublepir_answer_throughput — online answer GB/s on a checklist-shaped
     packed DB, batch-8 (reference kernels.rs:118-178; paper ~7.4 GB/s/core).
  5. spiral_scan_throughput_batch16  — encrypted-DB scan GB/s, 16-query
     batch sharing one DB pass (the serving pattern; reference batching
     advice docs/docs/performance.mdx, SURVEY 2.8).
  6. spiral_scan_single_query_device_ms — device-side single-query scan on
     a 2 GiB index (dispatch RTT excluded by k-loop differencing).

Metric definitions are FROZEN as of round 4. Throughput metrics carry BOTH
conventions as explicit keys:
    per_pass_gbps  — DB bytes / time for one pass (all batched queries
                     share the pass), the honest hardware number
    aggregate_gbps — DB bytes x batch / time, the per-query effective
                     serving bandwidth (reference batching advice basis)
`value` is per_pass_gbps for doublepir_answer_throughput (changed in r4:
the r3 value was aggregate AND paid a ~28 ms tunnel-RTT dispatch fee per
iteration — 38 ms measured for a 14 ms device answer) and aggregate for
spiral_scan_throughput_batch16 (unchanged since r1). As of r5 that
metric's per_pass_gbps key is k-loop differenced too (device-true): the
r4 key divided a wall time that was ~60% tunnel RTT.

Baselines: Spiral paper ~1 GB/s/core CPU DB scan and DoublePIR paper
~7.4 GB/s/core (BASELINE.md; the reference publishes no absolute numbers).
vs_baseline is the multiple over those CPU design points (for the p50 row:
effective GB/s of DB scanned per query over 1 GB/s).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import traceback

import numpy as np

NUM_QUERIES = 16
SPIRAL_BASELINE_GBPS = 1.0   # Spiral paper ~1 GB/s/core CPU design point
DOUBLEPIR_BASELINE_GBPS = 7.4

# SDK_TPU_BENCH_TINY=1 swaps every metric to a seconds-scale shape so the
# whole bench SCRIPT (operand generation, serving paths, JSON emission) is
# executable as a CPU test — the driver-run artifact must not drift against
# the library API between rounds. Numbers produced in tiny mode are
# meaningless; only the code path is under test.
TINY = bool(os.environ.get("SDK_TPU_BENCH_TINY"))

SPIRAL_SCAN_CFG = (
    '{"n": 2, "nu_1": 9, "nu_2": 6, "p": 256, "q2_bits": 20, "t_gsw": 8,'
    ' "t_conv": 4, "t_exp_left": 8, "t_exp_right": 56, "instances": 1,'
    ' "db_item_size": 8192}')
if TINY:
    SPIRAL_SCAN_CFG = (
        '{"n": 2, "nu_1": 4, "nu_2": 2, "p": 256, "q2_bits": 20, "t_gsw": 8,'
        ' "t_conv": 4, "t_exp_left": 8, "t_exp_right": 8, "instances": 1,'
        ' "db_item_size": 8192}')


def _emit(obj: dict) -> None:
    print(json.dumps(obj), flush=True)


def _scan_operands(params, R: int, layout: str = "latency"):
    """Generate a random encrypted index + query batch ON DEVICE (uploading
    multi-GB arrays through the axon tunnel is slow); values uniform in
    [0, q_c), decomposed into the int8 limb serving format of the given
    dense layout (ops/server_jax.db_tensor_to_device): "latency" planes for
    the single-query metric, "throughput" limb-concat channels for the
    batched one — each metric measures its serving profile's layout."""
    import jax
    import jax.numpy as jnp

    from sdk_tpu.ops import spiral_jax as sj

    dim0 = 1 << params.db_dim_1
    num_per = 1 << params.db_dim_2
    trials = params.n * params.n

    @jax.jit
    def gen():
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        planes, chans_q = [], []
        for c, q in enumerate(params.moduli):
            u32 = jax.random.randint(
                jax.random.fold_in(k1, c),
                (params.poly_len, 1, trials, num_per, dim0),
                0, q, dtype=jnp.uint32)
            limbs = [((u32 >> jnp.uint32(7 * k)) & jnp.uint32(127))
                     .astype(jnp.int8) for k in range(sj.NUM_LIMBS)]
            if layout == "throughput":
                # 5-D flat channel (..., L*dim0): matches the production
                # single-device storage (server_jax.db_tensor_to_device)
                ch = jnp.stack(limbs, axis=-2)
                planes.append(ch.reshape(ch.shape[:-2] + (-1,)))
            else:
                planes.extend(limbs)
            chans_q.append(jax.random.randint(
                jax.random.fold_in(k2, c), (params.poly_len, dim0, R),
                0, q, dtype=jnp.uint32))
        # tuple of crt*L planes (z, inst=1, trials, num_per, dim0) int8, or
        # crt channels (z, 1, trials, num_per, L*dim0) for throughput
        return tuple(planes), jnp.stack(chans_q, axis=0)

    db_dev, q_dev = gen()
    jax.block_until_ready(db_dev)
    db_bytes = trials * params.poly_len * num_per * dim0 * 8
    return db_dev, q_dev, db_bytes


def _kloop_pass_seconds(params, db_dev, q_dev, k_hi: int = 5,
                        reps: int = 6) -> float:
    """Device time of ONE firstdim_multiply pass over (db_dev, q_dev):
    k passes chained inside a single dispatch (q + i defeats CSE), timed
    best-of-reps at k=1 and k=k_hi, differenced — the per-dispatch tunnel
    RTT cancels exactly. Shared by both scan metrics so their k-loop
    methodology is identical by construction."""
    import functools

    import jax
    import jax.numpy as jnp

    from sdk_tpu.ops import spiral_jax as sj

    @functools.partial(jax.jit, static_argnums=2)
    def scan_k(db, q_arr, k):
        def body(i, acc):
            out = sj.firstdim_multiply(params, db,
                                       q_arr + i.astype(jnp.uint32))
            return acc + out.sum(dtype=jnp.uint32)

        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    def timed(k):
        int(scan_k(db_dev, q_dev, k))  # compile + warm
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            int(scan_k(db_dev, q_dev, k))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((timed(k_hi) - timed(1)) / (k_hi - 1), 1e-9)


def bench_scan_batch16() -> dict:
    import jax
    import jax.numpy as jnp

    from sdk_tpu.params import params_from_json
    from sdk_tpu.ops import spiral_jax as sj

    # Production-shaped scan: dim0=512, num_per=64 (nu_1=9, nu_2=6), n=2.
    # Measured in the LATENCY (limb-plane) dense layout: at this metric's
    # inst=1 / 2 GiB shape the throughput layout's weight-grouped query
    # operand (~0.9 GB int8 at R=32) is ~44% of the DB traffic and LOSES
    # (629 vs 695 GB/s agg, round 4) — its 1.6x win needs the operand
    # amortized over a bigger index (inst=4 / 8.6 GB, where the protocol
    # batch16 metric uses it). Also keeps this metric's definition frozen
    # (latency layout since r1).
    params = params_from_json(SPIRAL_SCAN_CFG)
    db_dev, q_dev, db_bytes = _scan_operands(params, 2 * NUM_QUERIES)

    import functools

    @jax.jit
    def scan(db, q_arr):
        out = sj.firstdim_multiply(params, db, q_arr)
        # reduce to a scalar so each timed iteration fetches one word —
        # block_until_ready through the axon tunnel does not await remote
        # completion, so the fetch is the only honest fence.
        return out.sum(dtype=jnp.uint32)

    int(scan(db_dev, q_dev))  # compile + warm
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        int(scan(db_dev, q_dev))
    dt = (time.perf_counter() - t0) / iters
    gbps = db_bytes * NUM_QUERIES / dt / 1e9

    # per_pass is k-loop DIFFERENCED (k passes chained in one dispatch,
    # k=1 vs k=5) so the ~28 ms tunnel dispatch RTT cancels — the r4
    # per_pass (= aggregate/16) divided a wall time that was ~60% RTT
    # over a ~20 ms device pass and understated the hardware ~2.4x.
    # `value` stays the aggregate wall-clock definition (frozen since r1).
    per_pass = db_bytes / _kloop_pass_seconds(params, db_dev, q_dev) / 1e9
    return {"metric": "spiral_scan_throughput_batch16",
            "value": round(gbps, 3), "unit": "GB/s",
            "per_pass_gbps": round(per_pass, 3),
            "aggregate_gbps": round(gbps, 3),
            "vs_baseline": round(gbps / SPIRAL_BASELINE_GBPS, 2)}


def bench_scan_single_device() -> dict:
    """Device-side single-query scan latency on a 2 GiB index: time k scans
    chained inside one dispatch for k in {1, 9} and difference — the per-
    dispatch tunnel RTT (~28 ms here) cancels exactly. (r5: timing is
    best-of-reps via the shared _kloop_pass_seconds helper — same
    methodology as the batch metric's per_pass by construction; mean vs
    best only moves the number within tunnel noise.)"""
    from sdk_tpu.params import params_from_json

    params = params_from_json(SPIRAL_SCAN_CFG)
    db_dev, q_dev, db_bytes = _scan_operands(params, 2)
    ms = max(_kloop_pass_seconds(params, db_dev, q_dev, k_hi=9,
                                 reps=8) * 1e3, 1e-6)
    eff_gbps = db_bytes / (ms / 1e3) / 1e9
    return {"metric": "spiral_scan_single_query_device_ms",
            "value": round(ms, 3), "unit": "ms",
            "vs_baseline": round(eff_gbps / SPIRAL_BASELINE_GBPS, 2)}


def bench_doublepir_answer() -> dict:
    """Online answer at the FULL production checklist config
    (reference js/bridge/src/doublepir_lib.rs:118-129: l=92681, m=92683,
    p=464, ~2^36 bloom bits) through the device-resident server
    (ChecklistServerJax): the batched 8-query answer — the bloom-checklist
    read pattern.

    Operand provenance: the DB content AND the public matrices A1/A2 are
    synthesized on device (uniform u32, the AES-CTR keystream's
    distribution). Uploading the ~750 MB of real derived A matrices through
    the ~30 MB/s axon tunnel is a harness artifact — it took 569 s in the
    round-3 driver run and starved the later metrics — and both the setup
    and answer kernels are content-independent. The hint planes still come
    from the REAL device setup program (srv.setup), so the answer runs on
    honestly-derived operands; bit-exactness of this exact path vs the host
    oracle is pinned separately by tests/test_doublepir_server_jax.py.

    Timing: k answers chained inside one dispatch, k=1 vs k=5 differenced,
    so the ~28 ms tunnel dispatch RTT cancels exactly (the same methodology
    as the Spiral scan metrics; the r3 number paid that RTT per iteration).
    `value` = per_pass_gbps (frozen as of r4)."""
    import jax
    import jax.numpy as jnp

    from sdk_tpu.doublepir.params import Params
    from sdk_tpu.doublepir.server_jax import ChecklistServerJax

    params = Params.from_string("64,6.4,13,17,32,464") if TINY \
        else Params.from_string("1024,6.4,92681,92683,32,464")
    num_entries = params.l * params.m * 8 if TINY else 1 << 36
    l, m, n = params.l, params.m, params.n
    nq = 8

    db = jax.jit(lambda: jax.random.randint(
        jax.random.PRNGKey(2), (l, m), -128, 128, dtype=jnp.int8))()
    jax.block_until_ready(db)
    srv = ChecklistServerJax(num_entries, params, None, db_dev=db)

    @jax.jit
    def gen_shared():
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        a1 = jax.random.randint(k1, (m, n), 0, jnp.uint32(0xFFFFFFFF),
                                dtype=jnp.uint32)
        a2 = jax.random.randint(k2, (l, n), 0, jnp.uint32(0xFFFFFFFF),
                                dtype=jnp.uint32)
        return a1, a2

    if os.environ.get("SDK_TPU_BENCH_REAL_A"):
        # production preprocess: REAL AES-derived A1/A2 streamed host->
        # device in chunks, accumulated into the device hint program
        # (ChecklistServerJax.setup_streamed). Opt-in: the ~760 MB of
        # A-matrix upload through the harness tunnel took 103-569 s in
        # round 3 and starved later metrics, so the default bench keeps
        # synthetic-A; the real-A wall time is recorded in BASELINE.md.
        t0 = time.perf_counter()
        srv.setup_streamed()
        setup_s = time.perf_counter() - t0
        print(f"doublepir device setup (REAL streamed A1/A2 derive+upload+"
              f"hint): {setup_s:.1f}s", file=sys.stderr, flush=True)
    else:
        t0 = time.perf_counter()
        a1, a2 = gen_shared()
        srv.setup([a1, a2])                  # real device hint program
        setup_s = time.perf_counter() - t0
        print(f"doublepir device setup (synthetic A, real hint program): "
              f"{setup_s:.1f}s", file=sys.stderr, flush=True)

    rng = np.random.default_rng(5)
    lp3, mp3 = -(-l // 3) * 3, -(-m // 3) * 3
    q1_all = jnp.asarray(rng.integers(0, 1 << 32, (mp3, nq),
                                      dtype=np.uint64)[:m].astype(np.uint32))
    q2_all = jnp.asarray(rng.integers(0, 1 << 32, (lp3, nq),
                                      dtype=np.uint64).astype(np.uint32))
    bidx = srv._batch_index(nq)

    import functools

    @functools.partial(jax.jit, static_argnums=7)
    def answer_k(db_, h1lo, h1hi, a2p, q1, q2, b, k):
        def body(i, acc):
            msg0, a_2, h_2 = srv._answer_fused(
                db_, h1lo, h1hi, a2p, q1 + i.astype(jnp.uint32), q2, b)
            return (acc + msg0.sum(dtype=jnp.uint32)
                    + a_2.sum(dtype=jnp.uint32) + h_2.sum(dtype=jnp.uint32))

        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    args = (srv.db, srv.h1_lo, srv.h1_hi, srv._a2_pad_dev, q1_all, q2_all,
            bidx)

    def timed(k, iters=6):
        int(answer_k(*args, k))  # compile + warm
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            int(answer_k(*args, k))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t5 = timed(1), timed(5)
    dt = max((t5 - t1) / 4, 1e-9)
    db_bytes = l * m  # 1 byte per element on device
    per_pass = db_bytes / dt / 1e9
    agg = per_pass * nq
    return {"metric": "doublepir_answer_throughput",
            "value": round(per_pass, 3), "unit": "GB/s",
            "per_pass_gbps": round(per_pass, 3),
            "aggregate_gbps": round(agg, 3),
            "vs_baseline": round(per_pass / DOUBLEPIR_BASELINE_GBPS, 2)}


def _spiral_batch16_fixture():
    """Shared setup for the batched serving metrics: a 1 GiB bucket in the
    throughput dense layout (the limb-concat layout's batched scan is 1.6x
    the latency layout's at NQ=16, round 4), 4 client sessions x 4 queries
    each, all for the planted key."""
    import base64

    from sdk_tpu.client import Client
    from sdk_tpu.kv.key_value import row_from_key
    from sdk_tpu.params_store import get_params_from_store
    from sdk_tpu.rng import ChaCha20Rng
    from sdk_tpu.server.kv_server import SpiralKvServer

    if TINY:
        from sdk_tpu.params import get_fast_expansion_testing_params
        params = get_fast_expansion_testing_params()
    else:
        params = get_params_from_store(15, 32768)
    srv = SpiralKvServer(params, dense_layout="throughput")
    srv.dense_migrate_fill = -1.0
    value = b"\x5a" * 64 if TINY else bytes(range(256)) * 64
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
        for qi in range(4):
            q = c.generate_query(
                row, noise_rng=ChaCha20Rng(bytes([0x80 + 4 * ci + qi]) * 32),
                query_seed=bytes([0xA0 + 4 * ci + qi]) * 32)
            blobs.append(uid.encode() + q.serialize(params))
    return params, srv, clients, blobs, value


def _check_batch(clients, value, resps) -> None:
    import bz2

    from sdk_tpu.kv.key_value import extract_result

    for i, resp in enumerate(resps):
        decoded = clients[i // 4].decode_response(resp)
        payload = bz2.BZ2Decompressor().decompress(decoded)
        assert extract_result("bench-key", payload) == value, \
            "decode mismatch — recall@1 violated"


def bench_spiral_batch16_protocol() -> dict:
    """Full-protocol BATCHED serving on the 1 GiB bucket config: 16
    queries from 4 distinct client sessions ride one fused scan+fold and
    one vmapped pack+encode dispatch (the coalescer's serving pattern).
    Reports ms per 16-query batch; vs_baseline is effective GB/s of index
    scanned per query over the Spiral paper's 1 GB/s/core point."""
    params, srv, clients, blobs, value = _spiral_batch16_fixture()

    def batch_once() -> float:
        t0 = time.perf_counter()
        resps = srv.private_read_blobs(blobs)
        dt = time.perf_counter() - t0
        _check_batch(clients, value, resps)
        return dt

    batch_once()  # compile + warm
    lat = sorted(batch_once() for _ in range(7))
    p50 = lat[len(lat) // 2]
    db_gb = params.num_items() * params.db_item_size / 1e9
    return {"metric": "spiral_batch16_full_protocol",
            "value": round(p50 * 1e3, 1), "unit": "ms/batch16",
            "vs_baseline": round((db_gb * 16 / p50) / SPIRAL_BASELINE_GBPS,
                                 2)}


def bench_spiral_sustained_qps() -> dict:
    """Sustained full-protocol serving throughput: K back-to-back
    16-query batches through the depth-2 dispatch/fetch pipeline
    (kv_server.dispatch_read_blobs — batch N+1 dispatches before batch
    N's fetch, so response transfer + dispatch RTT overlap device
    compute). Every response of every batch decode-verified. The
    single-batch metric above is cold-start LATENCY; this is the
    steady-state rate a deployment would see. vs_baseline: effective
    GB/s of index scanned per query over the Spiral paper's 1 GB/s/core."""
    from collections import deque

    params, srv, clients, blobs, value = _spiral_batch16_fixture()

    srv.private_read_blobs(blobs)  # compile + warm
    k_batches = 3 if TINY else 6
    t0 = time.perf_counter()
    fetches: deque = deque()
    all_resps = []
    for _ in range(k_batches):
        fetches.append(srv.dispatch_read_blobs(blobs))
        if len(fetches) >= 2:
            all_resps.append(fetches.popleft()())
    while fetches:
        all_resps.append(fetches.popleft()())
    dt = time.perf_counter() - t0
    for resps in all_resps:
        _check_batch(clients, value, resps)
    nq = len(blobs)
    qps = k_batches * nq / dt
    db_gb = params.num_items() * params.db_item_size / 1e9
    return {"metric": "spiral_sustained_qps",
            "value": round(qps, 2), "unit": "queries/s",
            "batches": k_batches, "pipeline_depth": 2,
            "vs_baseline": round(db_gb * qps / SPIRAL_BASELINE_GBPS, 2)}


def bench_spiral_p50_1gib() -> dict:
    """Full-protocol serving p50 on the 1 GiB bucket config: the whole
    /private-read path (deserialize, expand, scan, fold, pack, on-device
    encode, fetch) with decode verified bit-exact every iteration."""
    import base64

    from sdk_tpu.client import Client
    from sdk_tpu.kv.key_value import extract_result, row_from_key
    from sdk_tpu.params_store import get_params_from_store
    from sdk_tpu.rng import ChaCha20Rng
    from sdk_tpu.server.kv_server import SpiralKvServer

    if TINY:
        from sdk_tpu.params import get_fast_expansion_testing_params
        params = get_fast_expansion_testing_params()
    else:
        params = get_params_from_store(15, 32768)  # 2^15 x 32 KiB = 1 GiB
    srv = SpiralKvServer(params)
    # the metric is "serve a FULL 1 GiB index": force the dense layout even
    # though only one row is planted (the O(populated) CompactDb default
    # would otherwise scan a few MB and flatter the number)
    srv.dense_migrate_fill = -1.0
    value = b"\x5a" * 64 if TINY else bytes(range(256)) * 64  # 16 KiB payload
    srv.write_kv(json.dumps(
        {"bench-key": base64.b64encode(value).decode()}).encode())

    client = Client(params)
    pp = client.generate_keys_from_seed(
        b"\x41" * 32, noise_rng=ChaCha20Rng(b"\x42" * 32),
        pp_seed=b"\x43" * 32)
    uid = srv.setup_raw(pp.serialize(params))
    row = row_from_key(params.num_items(), "bench-key")
    query = client.generate_query(
        row, noise_rng=ChaCha20Rng(b"\x44" * 32), query_seed=b"\x45" * 32)
    blob = uid.encode() + query.serialize(params)

    import bz2

    def read_once() -> float:
        t0 = time.perf_counter()
        resp = srv.private_read_blobs([blob])[0]
        dt = time.perf_counter() - t0
        decoded = client.decode_response(resp)
        payload = bz2.BZ2Decompressor().decompress(decoded)
        assert extract_result("bench-key", payload) == value, \
            "decode mismatch — recall@1 violated"
        return dt

    read_once()  # compile + warm
    lat = sorted(read_once() for _ in range(15))
    p50 = lat[len(lat) // 2]
    db_gb = params.num_items() * params.db_item_size / 1e9
    return {"metric": "spiral_p50_1gib",
            "value": round(p50 * 1e3, 1), "unit": "ms",
            "vs_baseline": round((db_gb / p50) / SPIRAL_BASELINE_GBPS, 2)}


def _enable_jit_cache() -> None:
    import os

    import jax

    cache = os.environ.get("SDK_TPU_JIT_CACHE", "/tmp/sdk_tpu_jit_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


METRIC_NAMES = {
    "bench_spiral_p50_1gib": "spiral_p50_1gib",
    "bench_spiral_batch16_protocol": "spiral_batch16_full_protocol",
    "bench_spiral_sustained_qps": "spiral_sustained_qps",
    "bench_doublepir_answer": "doublepir_answer_throughput",
    "bench_scan_batch16": "spiral_scan_throughput_batch16",
    "bench_scan_single_device": "spiral_scan_single_query_device_ms",
}


def main():
    benches = [bench_spiral_p50_1gib, bench_spiral_batch16_protocol,
               bench_spiral_sustained_qps, bench_doublepir_answer,
               bench_scan_batch16, bench_scan_single_device]
    # optional argv filter: any substring of a bench name, e.g.
    # `python bench.py p50 doublepir`
    args = [a for a in sys.argv[1:] if a != "--inproc"]
    if args:
        benches = [f for f in benches
                   if any(a in f.__name__ for a in args)]

    if "--inproc" in sys.argv:
        if os.environ.get("SDK_TPU_FORCE_CPU"):
            # the axon TPU plugin overrides JAX_PLATFORMS env; force via
            # config (used by the tiny-mode CPU test)
            import jax

            jax.config.update("jax_platforms", "cpu")
        _enable_jit_cache()
        for fn in benches:
            try:
                _emit(fn())
            except Exception:  # noqa: BLE001 — one failed metric must not kill the rest
                print(f"bench {fn.__name__} failed:\n{traceback.format_exc()}",
                      file=sys.stderr, flush=True)
            gc.collect()  # free device buffers before the next metric
        return

    # Each metric runs in a FRESH subprocess: device-memory state from one
    # bench measurably contaminates the next in-process (the 8.6 GB
    # DoublePIR answer ran 2x slower after the scan benches' allocations —
    # 106 vs 204 GB/s isolated), and a clean process is the only reliable
    # reset of the XLA allocator. The persistent jit cache keeps repeat
    # compiles cheap.
    # Pre-flight: a DEAD device tunnel hangs every jax dispatch forever.
    # Without this check, each metric subprocess would burn its full
    # 2400 s bound on a tunnel that will never answer (5 metrics ≈ 200
    # min — exactly how the round-3 driver artifact died, rc=124 with
    # zero useful signal). One tiny fetch with a 300 s bound answers the
    # question cheaply; on failure, emit a diagnostic line and exit 0 so
    # the artifact records WHY there are no numbers.
    import subprocess

    if not TINY and not os.environ.get("SDK_TPU_FORCE_CPU"):
        # DEVNULL, not pipes: the device plugin spawns helper processes
        # that inherit stdout/stderr — with pipes, run() blocks in
        # communicate() past the timeout until the grandchildren exit.
        try:
            rc = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(int(jnp.sum(jnp.arange(8, dtype=jnp.int32))))"],
                timeout=300, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc != 0:
            _emit({"metric": "device_preflight", "value": 0,
                   "unit": "ok", "vs_baseline": 0,
                   "error": "device tunnel unreachable (tiny fetch did not "
                            "complete in 300s) — no metrics can run"})
            # one explicit error line PER metric, so a parser scanning for
            # any metric name sees "errored", never "silently absent"
            for fn in benches:
                _emit({"metric": METRIC_NAMES.get(fn.__name__, fn.__name__),
                       "value": 0, "unit": "error", "vs_baseline": 0,
                       "error": "skipped: device tunnel unreachable"})
            return

    # Per-metric wall-clock bound: a dead device tunnel hangs jax backend
    # init forever, and one stuck metric must not eat the whole bench run.
    # 40 min covers the slowest cold path (DoublePIR hint setup uploads
    # ~760 MB through the tunnel: 103-250 s, plus cold compiles).
    for fn in benches:
        try:
            rc = subprocess.run(
                [sys.executable, __file__, fn.__name__, "--inproc"],
                timeout=2400).returncode
        except subprocess.TimeoutExpired:
            print(f"bench {fn.__name__} timed out after 2400s "
                  "(device tunnel down?)", file=sys.stderr, flush=True)
            continue
        if rc != 0:
            print(f"bench {fn.__name__} subprocess rc={rc}",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()

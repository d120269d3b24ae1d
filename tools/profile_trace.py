"""Capture an XLA/TPU profiler trace of the hot serving program.

The tunnel adds ~25-30 ms of RTT and high day-to-day variance to every
wall-clock measurement (BASELINE.md), which masks kernel-level detail;
a jax.profiler trace sidesteps the tunnel entirely — the device runtime
records per-op timelines that TensorBoard (or xprof) renders co-located.
This is the "profile on real hardware" path from the round-3 roadmap:
run it wherever the chip is local and open the trace in TensorBoard's
Profile tab (`pip install tensorboard-plugin-profile` there; NOT in this
image — the trace directory is portable, scp it out).

What it traces (pick with --target):
  batch16     the full fused 16-query batched read on the 1 GiB bucket
              (bench.py's spiral_batch16_full_protocol fixture) — the
              production serving program: expansion, shared scan, folds,
              pack, encode in one dispatch.
  scan        the standalone first-dim scan at the 2 GiB bench shape.

Usage:
    python tools/profile_trace.py --out /tmp/sdk_tpu_trace [--target batch16]
    # tiny shapes on CPU (smoke / harness-free):
    SDK_TPU_BENCH_TINY=1 SDK_TPU_FORCE_CPU=1 python tools/profile_trace.py \
        --out /tmp/t --target batch16

Prints one JSON line with the trace directory and the traced wall time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="trace output directory")
    ap.add_argument("--target", default="batch16",
                    choices=["batch16", "scan"])
    ap.add_argument("--iters", type=int, default=2,
                    help="traced executions (first may include compile)")
    args = ap.parse_args(argv)

    if os.environ.get("SDK_TPU_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    import bench

    bench._enable_jit_cache()

    if args.target == "batch16":
        params, srv, clients, blobs, value = bench._spiral_batch16_fixture()

        def run_once():
            resps = srv.private_read_blobs(blobs)
            bench._check_batch(clients, value, resps)
    else:
        from sdk_tpu.ops import spiral_jax as sj
        from sdk_tpu.params import params_from_json

        params = params_from_json(bench.SPIRAL_SCAN_CFG)
        db_dev, q_dev, _ = bench._scan_operands(params, 2)
        scan = jax.jit(lambda db, q: sj.firstdim_multiply(params, db, q))
        int(scan(db_dev, q_dev).sum(dtype="uint32"))  # compile outside trace

        def run_once():
            int(scan(db_dev, q_dev).sum(dtype="uint32"))

    run_once()  # warm (compile) outside the trace window
    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            run_once()
    dt = time.perf_counter() - t0
    # the trace lands under <out>/plugins/profile/<ts>/ as .xplane.pb
    produced = []
    for root, _dirs, files in os.walk(args.out):
        produced += [os.path.join(root, f) for f in files
                     if f.endswith((".xplane.pb", ".trace.json.gz"))]
    summary = {"trace_dir": args.out, "target": args.target,
               "iters": args.iters, "traced_wall_s": round(dt, 3),
               "trace_files": sorted(produced),
               "platform": jax.devices()[0].platform}
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    main()

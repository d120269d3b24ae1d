"""The driver runs bench.py at the end of every round; if the script drifts
against the library API the round's metrics are silently lost. This test
executes the WHOLE script at tiny shapes (SDK_TPU_BENCH_TINY=1) on the CPU
backend and asserts one well-formed JSON line per BASELINE target."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPECTED = {
    "spiral_scan_throughput_batch16",
    "spiral_scan_single_query_device_ms",
    "doublepir_answer_throughput",
    "spiral_batch16_full_protocol",
    "spiral_sustained_qps",
    "spiral_p50_1gib",
}


def test_metric_names_map_matches_emitted():
    """bench.METRIC_NAMES (used for the per-metric dead-tunnel error lines)
    must cover exactly the real metric names — a drifted map would emit
    error lines under the wrong metric name."""
    sys.path.insert(0, REPO)
    import bench

    assert set(bench.METRIC_NAMES.values()) == EXPECTED
    for fname in bench.METRIC_NAMES:
        assert callable(getattr(bench, fname, None)), fname


def test_bench_tiny_emits_every_metric():
    env = dict(os.environ)
    env["SDK_TPU_BENCH_TINY"] = "1"
    env["SDK_TPU_FORCE_CPU"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--inproc"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3000)
    lines = [json.loads(ln) for ln in out.stdout.splitlines()
             if ln.strip().startswith("{")]
    got = {ln["metric"] for ln in lines}
    assert got == EXPECTED, (got, out.stderr[-2000:])
    core = {"metric", "value", "unit", "vs_baseline"}
    for ln in lines:
        assert core <= set(ln), ln
        # throughput metrics dual-report (frozen in round 4): per_pass is
        # one DB pass, aggregate = per_pass x batch
        extra = set(ln) - core
        assert extra <= {"per_pass_gbps", "aggregate_gbps", "batches",
                         "pipeline_depth"}, ln
        if ln["unit"] == "GB/s":
            assert extra == {"per_pass_gbps", "aggregate_gbps"}, ln
        assert isinstance(ln["value"], (int, float)), ln

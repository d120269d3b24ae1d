"""tools/profile_trace.py smoke: the profiler-capture tool runs the real
fused batched-read fixture under jax.profiler.trace at tiny shapes and
produces a non-empty xplane trace — so the co-located profiling path
(round-3 roadmap: kernel-level timelines without tunnel noise) can't
drift from the serving stack. Subprocess like test_bench_script: a fresh
interpreter picks up SDK_TPU_BENCH_TINY at bench-import time."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_profile_trace_smoke(tmp_path):
    env = dict(os.environ)
    env["SDK_TPU_BENCH_TINY"] = "1"
    env["SDK_TPU_FORCE_CPU"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "profile_trace.py"),
         "--out", str(tmp_path / "trace"), "--target", "batch16",
         "--iters", "1"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1200)
    lines = [ln for ln in out.stdout.splitlines()
             if ln.strip().startswith("{")]
    assert out.returncode == 0 and lines, out.stderr[-2000:]
    summary = json.loads(lines[-1])
    assert summary["platform"] == "cpu"
    assert summary["trace_files"], "profiler produced no xplane file"
    for f in summary["trace_files"]:
        assert os.path.getsize(f) > 0

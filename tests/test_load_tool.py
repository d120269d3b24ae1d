"""tools/load_test.py smoke: the concurrent-client load harness runs the
real spawn → setup → coalesced-read → verify loop at tiny shapes, so the
tool itself can't drift from the serving stack (same guard philosophy as
test_bench_script.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def test_load_tool_smoke():
    import load_test

    summary = load_test.main([
        "--clients", "3", "--duration", "2", "--window-ms", "10",
        "--n-keys", "8", "--writer",
    ])
    assert summary["errors"] == 0, summary["error_samples"]
    assert summary["reads"] > 0
    assert summary["qps"] > 0
    # the coalescer must have actually batched concurrent readers at least
    # once (3 clients in a 10 ms window); max_batch > 1 proves the merged
    # path executed under load
    rc = summary["read_coalescer"]
    assert rc.get("requests", 0) >= summary["reads"]
    assert rc.get("max_batch", 0) >= 2, rc

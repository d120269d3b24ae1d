"""jax.distributed two-process smoke (gated: SDK_TPU_MULTIPROC=1).

Exercises the REAL multi-process init + cross-process collective path on
the CPU backend — two OS processes, each with 2 virtual devices, one
global mesh, the exact mod-q psum (ops/shard.psum_mod) reducing partial
sums ACROSS processes over gRPC. This is the layer the single-process
8-device CPU-mesh tests (test_sharded*) cannot reach; after this, the only
untested piece of the DCN story is physical networking.

Run:  SDK_TPU_MULTIPROC=1 python -m pytest tests/test_multiproc.py -q
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SDK_TPU_MULTIPROC"),
    reason="set SDK_TPU_MULTIPROC=1 to run the two-process smoke")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_psum_mod():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coordinator, "2", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i]}"
    assert "multiproc psum_mod ok=True ndev=4" in outs[0], outs[0]

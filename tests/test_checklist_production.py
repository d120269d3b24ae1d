"""Checklist serving through the device engine (ChecklistServerJax).

Default run: a 2^20-bit bloom DB served end-to-end over HTTP with the
device engine on the CPU backend — the same code path the production
deployment uses on TPU.

Gated run (SDK_TPU_TPU_E2E=1, real chip): a 2^33-bit production-family
config (p=464 byte-element, reference js/bridge/src/doublepir_lib.rs:118-129
scaled to fit one upload) — checkInclusion with the answer matvec on
device, which is VERDICT round-2 task 4's done criterion (>= 2^30 bits).
"""

import os
import socket

import numpy as np
import pytest

from sdk_tpu.doublepir.params import Params


def free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _detectable_keys(prefix: str, params, log2m: int, want: int,
                     packing: int = 8, k: int = 8) -> list[str]:
    """Keys whose bloom indices land in >= 5 distinct row-batches.

    The reference's batch plan drops indices that collide into an
    already-taken batch (client.rs:174-213) and checkInclusion requires
    >= 5 recovered 1-bits (bucket.ts:213-223), so detectability of a
    present key is a deterministic property of the key. Both our paths
    and the reference share this behavior."""
    from sdk_tpu.clients.bloom import bloom_hash

    batch_sz = params.l // k
    out, i = [], 0
    while len(out) < want:
        key = f"{prefix}-{i}"
        i += 1
        batches = {min(((bloom_hash(key, j, log2m) // packing) // params.m)
                       // batch_sz, k - 1) for j in range(k)}
        if len(batches) >= 5:
            out.append(key)
    return out


def _serve_and_check(srv, present: list[str], absent: list[str]):
    from sdk_tpu.clients.api import API
    from sdk_tpu.clients.bucket import Bucket
    from sdk_tpu.server.doublepir_server import serve_doublepir

    port = free_port()
    httpd = serve_doublepir(srv, port, block=False)
    try:
        bucket = Bucket(API("", f"http://localhost:{port}"))
        assert bucket.scheme == "doublepir"
        for k in present:
            assert bucket.check_inclusion(k) is True, k
        for k in absent:
            assert bucket.check_inclusion(k) is False, k
    finally:
        httpd.shutdown()


def test_device_engine_checklist_e2e():
    """2^20-bit bloom, engine path (byte-element config), full HTTP stack."""
    from sdk_tpu.server.doublepir_server import DoublePirKvServer

    # production params family: p=464 -> packing=8 (byte elements). n must
    # stay 1024: the params store validates (sigma, p) noise at n=1024, and
    # smaller n makes the p=464 rounding margin fail (measured: n=256 decodes
    # wrong on the HOST path too at this shape)
    params = Params(n=1024, sigma=6.4, l=368, m=368, logq=32, p=464)
    srv = DoublePirKvServer(log2m=20, params=params, use_device=True)
    present = _detectable_keys("pw", params, 20, 2)
    srv.add_keys(present + [f"pw-extra-{i}" for i in range(62)])
    srv._rebuild()
    assert srv._engine is not None, "engine path must engage for p=464"
    _serve_and_check(srv, present, ["not-a-member", "pw-nope"])


@pytest.mark.skipif(os.environ.get("SDK_TPU_TPU_E2E") != "1",
                    reason="2^33-bit run needs the real TPU chip "
                           "(set SDK_TPU_TPU_E2E=1)")
def test_production_scale_checklist_on_tpu():
    """2^33 bloom bits (8x the >=2^30 bar), answer matvec on the TPU."""
    import jax

    assert jax.devices()[0].platform != "cpu"
    from sdk_tpu.server.doublepir_server import DoublePirKvServer

    params = Params(n=1024, sigma=6.4, l=32768, m=32768, logq=32, p=464)
    srv = DoublePirKvServer(log2m=33, params=params, use_device=True)
    present = _detectable_keys("breached", params, 33, 2)
    srv.add_keys(present + [f"breached-extra-{i}" for i in range(30)])
    srv._rebuild()
    assert srv._engine is not None
    assert srv._engine.db.nbytes == (1 << 30)   # 1 B per element on device
    _serve_and_check(srv, present, ["safe-password", "also-safe"])


def test_sharded_engine_checklist_e2e():
    """Checklist service with the DB row-sharded over a 4-device mesh,
    full HTTP stack: hint + answers must serve transparently (the client
    can't tell a sharded server from a single-device one)."""
    from sdk_tpu.ops.shard import make_mesh
    from sdk_tpu.server.doublepir_server import DoublePirKvServer

    params = Params(n=1024, sigma=6.4, l=368, m=368, logq=32, p=464)
    srv = DoublePirKvServer(log2m=20, params=params, mesh=make_mesh(4))
    present = _detectable_keys("shpw", params, 20, 2)
    srv.add_keys(present + [f"shpw-extra-{i}" for i in range(40)])
    srv._rebuild()
    assert srv._engine is not None and srv._engine.mesh is not None
    _serve_and_check(srv, present, ["not-in-the-set", "shpw-missing"])

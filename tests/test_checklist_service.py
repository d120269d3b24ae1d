"""DoublePIR checklist service e2e (reference call stack SURVEY 3.4:
Bucket.checkInclusion -> bloom indices -> batched DoublePIR -> >= 5 of 8
bits) plus the Spiral /bloom route + private_key_intersect."""

import json
import socket

import numpy as np
import pytest

from sdk_tpu.params import get_fast_expansion_testing_params, params_to_json_obj


def free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def checklist_server():
    from sdk_tpu.doublepir.params import Params
    from sdk_tpu.server.doublepir_server import (DoublePirKvServer,
                                                 serve_doublepir)

    # 2^16-bit bloom DB: small but realistic shape
    srv = DoublePirKvServer(log2m=16)
    srv.add_keys([f"breached-password-{i}" for i in range(50)])
    assert srv.warmup() > 0   # pre-compile; the tests below assert that
    port = free_port()        # serving-after-warmup stays correct
    httpd = serve_doublepir(srv, port, block=False)
    yield port
    httpd.shutdown()


def test_check_inclusion_e2e(checklist_server):
    from sdk_tpu.clients.api import API
    from sdk_tpu.clients.bucket import Bucket

    bucket = Bucket(API("", f"http://localhost:{checklist_server}"))
    assert bucket.scheme == "doublepir"
    assert bucket.check_inclusion("breached-password-7") is True
    assert bucket.check_inclusion("breached-password-49") is True
    assert bucket.check_inclusion("safe-password-xyz") is False

    # spiral ops must be refused on a doublepir bucket
    with pytest.raises(RuntimeError):
        bucket._ensure_scheme("spiral")


@pytest.fixture(scope="module")
def spiral_server_bloom():
    from sdk_tpu.server.http import serve
    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_fast_expansion_testing_params()
    srv = SpiralKvServer(params, json.dumps(params_to_json_obj(params)),
                         key_storage_policy="full")
    port = free_port()
    httpd = serve(srv, port, block=False)
    yield port
    httpd.shutdown()


def test_private_key_intersect(spiral_server_bloom):
    from sdk_tpu.clients.bucket_service import connect_local

    bucket = connect_local(spiral_server_bloom)
    bucket.write({"alice": b"1", "bob": b"2", "carol": b"3"})
    got = bucket.private_key_intersect(["alice", "carol", "mallory", "trent"])
    assert sorted(got) == ["alice", "carol"]


def test_list_keys_and_clear(spiral_server_bloom):
    from sdk_tpu.clients.api import API

    api = API("", f"http://localhost:{spiral_server_bloom}")
    keys = api._get(api.endpoint + "/list-keys")
    assert "alice" in keys and "bob" in keys

    api._post(api.endpoint + "/clear", b"{}", compress=False)
    from sdk_tpu.clients.bucket_service import connect_local
    bucket = connect_local(spiral_server_bloom)
    assert bucket.private_read(["alice"]) == [None]


def test_checklist_save_restore_device(tmp_path):
    """Checkpoint a device-engine checklist and restore it into a fresh
    server: the hint artifacts install without re-running setup, answers
    are bit-identical, and a real client checkInclusion works over HTTP on
    the restored state (the reference preprocess->serve flow)."""
    from sdk_tpu.clients.api import API
    from sdk_tpu.clients.bucket import Bucket
    from sdk_tpu.doublepir.params import Params
    from sdk_tpu.doublepir.serializer import serialize_states
    from sdk_tpu.server.doublepir_server import (DoublePirKvServer,
                                                 serve_doublepir)

    # explicit byte-element (packing=8) config so the device engine engages
    params = Params(n=64, sigma=6.4, l=13, m=17, logq=32, p=464)
    srv = DoublePirKvServer(10, params=params, use_device=True)
    srv.add_keys(["alpha", "beta", "gamma"])
    hint = srv.get_hint()
    assert srv._engine is not None, "config should hit the device engine"
    srv.save_to_dir(str(tmp_path / "ck"))

    restored = DoublePirKvServer(10, params=params, use_device=True)
    restored.restore_from_dir(str(tmp_path / "ck"))
    assert restored._engine is not None and not restored._dirty, \
        "restore should install the saved hint, not schedule a rebuild"
    assert restored.get_hint() == hint
    assert restored.keys == srv.keys and restored.version == srv.version

    rng = np.random.default_rng(1)
    lp3 = -(-srv.params.l // 3) * 3
    mp3 = -(-srv.params.m // 3) * 3
    q = [rng.integers(0, 1 << 32, (mp3, 1), dtype=np.uint64)
         .astype(np.uint32),
         rng.integers(0, 1 << 32, (lp3, 1), dtype=np.uint64)
         .astype(np.uint32)]
    qb = serialize_states([q])
    assert restored.answer(qb) == srv.answer(qb)

    port = free_port()
    httpd = serve_doublepir(restored, port, block=False)
    try:
        bucket = Bucket(API("", f"http://localhost:{port}"))
        assert bucket.check_inclusion("alpha") is True
        assert bucket.check_inclusion("not-a-member-xyz") is False
    finally:
        httpd.shutdown()


def test_checklist_restore_config_mismatch_rebuilds(tmp_path):
    """A checkpoint whose hint artifacts don't match the restoring server's
    engine config falls back to rebuilding from the bloom bits — it must
    never serve mis-shaped state."""
    from sdk_tpu.doublepir.params import Params
    from sdk_tpu.server.doublepir_server import DoublePirKvServer

    params = Params(n=64, sigma=6.4, l=13, m=17, logq=32, p=464)
    srv = DoublePirKvServer(10, params=params, use_device=True)
    srv.add_keys(["alpha"])
    srv.get_hint()
    srv.save_to_dir(str(tmp_path / "ck"))
    # corrupt the hint artifact shape
    h1 = np.load(tmp_path / "ck" / "h1_sq.npy")
    np.save(tmp_path / "ck" / "h1_sq.npy", h1[:, :-1])

    restored = DoublePirKvServer(10, params=params, use_device=True)
    restored.restore_from_dir(str(tmp_path / "ck"))
    assert restored._dirty, "mismatched artifact must schedule a rebuild"
    restored.get_hint()   # rebuild from bits
    assert restored.get_hint() == srv.get_hint()

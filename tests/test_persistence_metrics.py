"""Spiral server checkpoint/restore of the preprocessed encrypted index and
the per-stage metrics surface."""

import json

import numpy as np
import pytest

from sdk_tpu.params import get_fast_expansion_testing_params, params_to_json_obj
from sdk_tpu.server.kv_server import SpiralKvServer


def test_save_restore_spiral_index(tmp_path):
    params = get_fast_expansion_testing_params()
    cfg = json.dumps(params_to_json_obj(params))
    srv = SpiralKvServer(params, cfg, key_storage_policy="full")
    import base64

    body = json.dumps({"k1": base64.b64encode(b"value-1").decode(),
                       "k2": base64.b64encode(b"value-2").decode()}).encode()
    srv.write_kv(body)
    srv._flush()

    srv.save_to_dir(str(tmp_path / "ckpt"))

    srv2 = SpiralKvServer(params, cfg, key_storage_policy="full")
    srv2.restore_from_dir(str(tmp_path / "ckpt"))
    for p2, p1 in zip(srv2.engine.db, srv.engine.db):
        np.testing.assert_array_equal(np.asarray(p2), np.asarray(p1))
    assert srv2.version == srv.version
    assert [bytes(r) for r in srv2.rows] == [bytes(r) for r in srv.rows]
    assert srv2.list_keys() == ["k1", "k2"]
    assert srv2.bloom_bytes() == srv.bloom_bytes()


def test_metrics_snapshot():
    from sdk_tpu.telemetry import StageTimers

    t = StageTimers()
    with t.stage("scan"):
        pass
    with t.stage("scan"):
        pass
    snap = t.snapshot()
    assert snap["scan"]["count"] == 2
    assert snap["scan"]["total_us"] >= 0

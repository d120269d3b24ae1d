"""HBM capacity guard: a flush that would migrate to a dense index the
device cannot hold must fail with a clean, actionable error BEFORE any
allocation — not an allocator OOM mid-flush (round 4 found the batch-16
OOM at bench time by luck; the reference server just mallocs,
bin/server.rs, so this is TPU-native hygiene with no reference analogue).
"""

import base64
import json

import pytest

from sdk_tpu.params import get_fast_expansion_testing_params


def _write(srv, kv: dict) -> None:
    srv.write_kv(json.dumps(
        {k: base64.b64encode(v).decode() for k, v in kv.items()}).encode())


def test_flush_refused_on_tiny_budget():
    from sdk_tpu.ops.server_jax import index_hbm_bytes
    from sdk_tpu.server.kv_server import BucketCapacityError, SpiralKvServer

    params = get_fast_expansion_testing_params()
    srv = SpiralKvServer(params)
    srv.hbm_budget_bytes = index_hbm_bytes(params) // 2  # cannot fit dense
    srv.dense_migrate_fill = 0.0                         # force migration
    _write(srv, {"k": b"v"})
    # migration refused -> logged once, bucket STAYS COMPACT and keeps
    # serving (flush runs lazily on the read path, so raising there would
    # turn every read into an error); _check_capacity's message names the
    # max bucket size and both escape hatches
    with pytest.raises(BucketCapacityError) as ei:
        srv._check_capacity()
    msg = str(ei.value)
    assert "Max bucket" in msg and "sharded" in msg and "dcn" in msg.lower()
    with srv.lock:
        srv._flush()          # does NOT raise: degrades to compact serving
    assert srv._migration_refused
    from sdk_tpu.ops.spiral_jax import CompactDb

    assert isinstance(srv.engine.db, CompactDb)
    # the bucket still serves reads bit-exactly after the refusal
    from tests.util_protocol import read_via_protocol

    assert read_via_protocol(srv, "k") == b"v"


def test_flush_allowed_when_it_fits():
    from sdk_tpu.ops.server_jax import (index_hbm_bytes,
                                        serving_working_set_bytes)
    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_fast_expansion_testing_params()
    srv = SpiralKvServer(params)
    srv.hbm_budget_bytes = (index_hbm_bytes(params)
                            + serving_working_set_bytes(params)) * 2 \
        + srv.engine.stack_cache_budget_bytes()
    srv.dense_migrate_fill = 0.0
    _write(srv, {"k": b"v"})
    with srv.lock:
        srv._flush()
    from sdk_tpu.ops.spiral_jax import CompactDb

    assert not isinstance(srv.engine.db, CompactDb)


def test_sharded_start_refused_on_tiny_budget():
    """Sharded serving allocates dense at construction: the guard must
    fire there too, before the mesh-wide allocation."""
    from sdk_tpu.ops.server_jax import index_hbm_bytes
    from sdk_tpu.ops.shard import make_mesh
    from sdk_tpu.server.kv_server import BucketCapacityError, SpiralKvServer

    params = get_fast_expansion_testing_params()
    mesh = make_mesh(4)

    class Tiny(SpiralKvServer):
        # per-device share is idx/4; a budget below that must refuse
        def _device_budget_bytes(self):
            return index_hbm_bytes(params) // 8

    with pytest.raises(BucketCapacityError):
        Tiny(params, mesh=mesh)

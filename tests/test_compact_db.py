"""O(populated) compact device DB (reference SparseDb memory model,
lib/server/src/db/sparse_db.rs:1-48).

- compact firstdim scan is bit-exact vs the dense limb-plane scan,
  including after capacity growth and in-place overwrites
- an empty bucket pins O(num_per * cap_bin) device memory, not the full
  2^(nu_1+nu_2) space
- crossing dense_migrate_fill migrates the index to dense on device with
  reads unchanged
- compact checkpoints round-trip
"""

import base64
import json

import numpy as np
import pytest

from sdk_tpu.params import (get_fast_expansion_testing_params,
                            params_from_json, params_to_json_obj)


def _tiny_params():
    return params_from_json(
        '{"direct_upload": 1, "n": 2, "nu_1": 3, "nu_2": 2, "p": 256,'
        ' "q2_bits": 20, "t_gsw": 4, "t_conv": 4, "t_exp_left": 8,'
        ' "t_exp_right": 8}')


def _rand_row(params, rng) -> bytes:
    n = params.instances * params.n * params.n * params.bytes_per_chunk()
    return rng.integers(0, 256, n, dtype=np.uint8).tobytes()


def test_compact_scan_bit_exact_vs_dense():
    import jax.numpy as jnp

    from sdk_tpu.kv.ingest import DbUpdateBuffer, compact_to_dense
    from sdk_tpu.ops import spiral_jax as sj
    from sdk_tpu.ops.server_jax import db_zeros_device

    params = _tiny_params()
    rng = np.random.default_rng(1)
    num_items = params.num_items()
    datas = {i: _rand_row(params, rng) for i in (0, 5, num_items - 1)}

    bd = DbUpdateBuffer(params)
    bc = DbUpdateBuffer(params)
    for i, d in datas.items():
        bd.upsert_raw(i, d)
        bc.upsert_raw(i, d)
    dense = bd.flush(db_zeros_device(params))
    # cap_bin=1 forces capacity growth on first flush
    compact = bc.flush(sj.compact_db_empty(params, cap_bin=1))
    assert isinstance(compact, sj.CompactDb)

    q_arr = jnp.asarray(np.stack(
        [rng.integers(0, q, (params.poly_len, 1 << params.db_dim_1, 2),
                      dtype=np.uint64).astype(np.uint32)
         for q in params.moduli]))
    np.testing.assert_array_equal(
        np.asarray(sj.firstdim_multiply(params, dense, q_arr)),
        np.asarray(sj.firstdim_multiply(params, compact, q_arr)))

    # overwrite an existing item in both layouts
    new = _rand_row(params, rng)
    bd.upsert_raw(5, new)
    bc.upsert_raw(5, new)
    dense = bd.flush(dense)
    compact = bc.flush(compact)
    np.testing.assert_array_equal(
        np.asarray(sj.firstdim_multiply(params, dense, q_arr)),
        np.asarray(sj.firstdim_multiply(params, compact, q_arr)))

    # device-side migration reproduces the dense tensor exactly
    migrated = compact_to_dense(params, compact)
    for a, b in zip(migrated, dense):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compact_scan_qT_bit_exact_vs_dense():
    """firstdim_multiply_qT (the batched serving path's transposed flat
    query carrier) on a CompactDb must be bit-identical to the dense qT
    scan AND to the untransposed compact scan — this is the path a batched
    /private-read takes on a low-fill bucket (regression: it used to raise,
    500-ing every batched read on a compact bucket)."""
    import jax.numpy as jnp

    from sdk_tpu.kv.ingest import DbUpdateBuffer
    from sdk_tpu.ops import spiral_jax as sj
    from sdk_tpu.ops.server_jax import db_zeros_device

    params = _tiny_params()
    rng = np.random.default_rng(3)
    num_items = params.num_items()
    datas = {i: _rand_row(params, rng) for i in (1, 6, num_items - 2)}

    bd = DbUpdateBuffer(params)
    bc = DbUpdateBuffer(params)
    for i, d in datas.items():
        bd.upsert_raw(i, d)
        bc.upsert_raw(i, d)
    dense = bd.flush(db_zeros_device(params))
    compact = bc.flush(sj.compact_db_empty(params, cap_bin=2))
    assert isinstance(compact, sj.CompactDb)

    R = 4  # two queries' row pairs in the batched column layout
    q_t = jnp.asarray(np.stack(
        [rng.integers(0, q, (params.poly_len, R, 1 << params.db_dim_1),
                      dtype=np.uint64).astype(np.uint32)
         for q in params.moduli]))
    want = np.asarray(sj.firstdim_multiply_qT(params, dense, q_t))
    got = np.asarray(sj.firstdim_multiply_qT(params, compact, q_t))
    np.testing.assert_array_equal(got, want)
    # and vs the untransposed compact scan on the same query values
    q_arr = jnp.transpose(q_t, (0, 1, 3, 2))
    np.testing.assert_array_equal(
        np.asarray(sj.firstdim_multiply(params, compact, q_arr)), want)


def test_compact_scan_cap_chunking_bit_exact(monkeypatch):
    """The slot-axis chunking (fusion-cliff guard) must not change results:
    force a tiny chunk so every cap spans several chunks plus a ragged
    tail, and compare against dense."""
    import jax.numpy as jnp

    from sdk_tpu.kv.ingest import DbUpdateBuffer
    from sdk_tpu.ops import spiral_jax as sj
    from sdk_tpu.ops.server_jax import db_zeros_device

    monkeypatch.setattr(sj, "_COMPACT_CAP_CHUNK", 3)
    params = _tiny_params()
    rng = np.random.default_rng(7)
    num_items = params.num_items()
    # enough writes that some bin's cap grows past one chunk (3, 3, 2)
    datas = {i: _rand_row(params, rng) for i in range(0, num_items, 4)}

    bd = DbUpdateBuffer(params)
    bc = DbUpdateBuffer(params)
    for i, d in datas.items():
        bd.upsert_raw(i, d)
        bc.upsert_raw(i, d)
    dense = bd.flush(db_zeros_device(params))
    compact = bc.flush(sj.compact_db_empty(params, cap_bin=8))
    assert isinstance(compact, sj.CompactDb)
    assert compact.planes[0].shape[-1] > 3  # spans >1 chunk

    q_arr = jnp.asarray(np.stack(
        [rng.integers(0, q, (params.poly_len, 1 << params.db_dim_1, 2),
                      dtype=np.uint64).astype(np.uint32)
         for q in params.moduli]))
    np.testing.assert_array_equal(
        np.asarray(sj.firstdim_multiply(params, dense, q_arr)),
        np.asarray(sj.firstdim_multiply(params, compact, q_arr)))


def test_empty_bucket_memory_is_o_populated():
    from sdk_tpu.ops.spiral_jax import CompactDb
    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_fast_expansion_testing_params()
    srv = SpiralKvServer(params)
    assert isinstance(srv.engine.db, CompactDb)
    dim0 = 1 << params.db_dim_1
    cap = srv.engine.db.planes[0].shape[-1]
    assert cap < dim0
    compact_bytes = sum(p.nbytes for p in srv.engine.db.planes)
    dense_bytes = (params.crt_count * 4 * params.poly_len * params.instances
                   * params.n * params.n * (1 << params.db_dim_2) * dim0)
    assert compact_bytes * 2 <= dense_bytes * cap * 2 // dim0 + 1
    assert compact_bytes == dense_bytes * cap // dim0


def test_migration_to_dense_preserves_reads():
    from sdk_tpu.ops.spiral_jax import CompactDb
    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_fast_expansion_testing_params()
    cfg = json.dumps(params_to_json_obj(params))
    srv = SpiralKvServer(params, cfg)

    def write(kv: dict) -> None:
        srv.write_kv(json.dumps(
            {k: base64.b64encode(v).decode() for k, v in kv.items()}).encode())

    write({"key-a": b"value-a", "key-b": b"value-b"})
    srv._flush()
    assert isinstance(srv.engine.db, CompactDb)

    from tests.util_protocol import read_via_protocol

    assert read_via_protocol(srv, "key-a") == b"value-a"

    # force migration on the next flush
    srv.dense_migrate_fill = 0.0
    write({"key-c": b"value-c"})
    srv._flush()
    assert not isinstance(srv.engine.db, CompactDb)
    assert read_via_protocol(srv, "key-a") == b"value-a"
    assert read_via_protocol(srv, "key-c") == b"value-c"

    # clear drops back to a fresh compact index
    srv.clear()
    assert isinstance(srv.engine.db, CompactDb)


def test_compact_checkpoint_roundtrip(tmp_path):
    from sdk_tpu.ops.spiral_jax import CompactDb
    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_fast_expansion_testing_params()
    cfg = json.dumps(params_to_json_obj(params))
    srv = SpiralKvServer(params, cfg)
    srv.write_kv(json.dumps(
        {"ck-key": base64.b64encode(b"ck-value").decode()}).encode())
    srv._flush()
    assert isinstance(srv.engine.db, CompactDb)
    srv.save_to_dir(str(tmp_path / "ckpt"))

    srv2 = SpiralKvServer(params, cfg)
    srv2.restore_from_dir(str(tmp_path / "ckpt"))
    assert isinstance(srv2.engine.db, CompactDb)
    for p2, p1 in zip(srv2.engine.db.planes, srv.engine.db.planes):
        np.testing.assert_array_equal(np.asarray(p2), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(srv2.engine.db.idx_j),
                                  np.asarray(srv.engine.db.idx_j))
    assert srv2._updates.slots.slot_of == srv._updates.slots.slot_of

    from tests.util_protocol import read_via_protocol

    assert read_via_protocol(srv2, "ck-key") == b"ck-value"

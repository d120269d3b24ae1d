"""DoublePIR TPU kernels vs the host (numpy) implementations — exact mod
2^32 equality, plus an e2e run with the device matmul plugged into setup."""

import numpy as np
import pytest

from sdk_tpu.doublepir import scheme
from sdk_tpu.doublepir.database import Db
from sdk_tpu.doublepir.jax_kernels import (matmul_u32_device,
                                           mat_mul_vec_packed_traced)
from sdk_tpu.doublepir.matrix import (mat_mul_vec_packed, matmul_u32, squish)
from sdk_tpu.doublepir.params import LOGQ, SEC_PARAM, pick_params

U32 = np.uint32
RNG = np.random.default_rng(21)


def test_matmul_u32_device_matches_host():
    a = RNG.integers(0, 1 << 32, (64, 300), dtype=np.uint64).astype(U32)
    b = RNG.integers(0, 1 << 32, (300, 7), dtype=np.uint64).astype(U32)
    np.testing.assert_array_equal(matmul_u32_device(a, b), matmul_u32(a, b))


def test_matmul_u32_device_chunked_reduction():
    # K larger than one chunk exercises the cross-chunk wrap accumulation
    a = RNG.integers(0, 1 << 32, (4, (1 << 16) + 123), dtype=np.uint64).astype(U32)
    b = RNG.integers(0, 1 << 32, ((1 << 16) + 123, 3), dtype=np.uint64).astype(U32)
    np.testing.assert_array_equal(matmul_u32_device(a, b), matmul_u32(a, b))


def test_packed_matvec_device_matches_host():
    import jax

    rows, cols = 32, 11
    a = RNG.integers(0, 1 << 10, (rows, cols * 3), dtype=np.uint64).astype(U32)
    ap = squish(a)
    q = RNG.integers(0, 1 << 32, (cols * 3, 1), dtype=np.uint64).astype(U32)
    got = np.asarray(jax.jit(mat_mul_vec_packed_traced)(ap, q))
    np.testing.assert_array_equal(got, mat_mul_vec_packed(ap, q))


def test_e2e_with_device_setup_matmul():
    num_entries = 1 << 14
    params = pick_params(num_entries, 1, SEC_PARAM, LOGQ, lower_bound_m=1)
    idx = int(RNG.integers(0, num_entries))
    vals = RNG.integers(0, 2, num_entries, dtype=np.uint64)
    vals[idx] = 1
    db = Db.from_entries(num_entries, 1, params, vals.tolist())

    shared = scheme.init(db.info, params)
    server_state, hint = scheme.setup(db, shared, params,
                                      matmul_u32_fn=matmul_u32_device)
    cs, q = scheme.query(idx, shared, params, db.info, RNG)
    ans = scheme.answer(db, [q], server_state, params)
    result = scheme.recover(idx, 0, hint, q, ans, shared, cs, params, db.info)
    assert result == 1


def test_answer_with_device_kernels():
    from sdk_tpu.doublepir.jax_kernels import device_kernels

    num_entries = 1 << 14
    params = pick_params(num_entries, 1, SEC_PARAM, LOGQ, lower_bound_m=1)
    idx = int(RNG.integers(0, num_entries))
    vals = RNG.integers(0, 2, num_entries, dtype=np.uint64)
    vals[idx] = 1
    db = Db.from_entries(num_entries, 1, params, vals.tolist())
    shared = scheme.init(db.info, params)
    server_state, hint = scheme.setup(db, shared, params)
    cs, q = scheme.query(idx, shared, params, db.info, RNG)
    ans_host = scheme.answer(db, [q], server_state, params)
    ans_dev = scheme.answer(db, [q], server_state, params,
                            kernels=device_kernels())
    for a, b in zip(ans_host, ans_dev):
        np.testing.assert_array_equal(a, b)
    result = scheme.recover(idx, 0, hint, q, ans_dev, shared, cs, params,
                            db.info)
    assert result == 1

"""DoublePIR tests mirroring the reference's strategy
(lib/doublepir/src/doublepir/doublepir.rs:461-717 e2e tests; derivation.rs
golden bytes; squish.rs / contract.rs inverse tests)."""

import numpy as np
import pytest

from sdk_tpu.doublepir import scheme
from sdk_tpu.doublepir.database import Db, DbInfo
from sdk_tpu.doublepir.matrix import (
    SEEDS_SHORT, contract, derive_aes_bytes, derive_from_seed, expand,
    mat_mul_transposed_packed, mat_mul_vec_packed, matmul_u32, squish,
    transpose_expand_concat_cols_squish, unsquish)
from sdk_tpu.doublepir.params import LOGQ, SEC_PARAM, Params, pick_params

U32 = np.uint32
RNG = np.random.default_rng(7)


def test_aes_derivation_goldens():
    """Golden bytes from the reference (derivation.rs:72-88)."""
    data = derive_aes_bytes(SEEDS_SHORT[0], 259 * 65536)
    assert data[0] == 247
    assert data[16] == 196
    assert data[258 * 65536] == 63
    data = derive_aes_bytes(SEEDS_SHORT[1], 259 * 65536)
    assert data[0] == 132
    assert data[258 * 65536] == 254


def test_matmul_u32_wraps_exactly():
    a = RNG.integers(0, 1 << 32, (37, 501), dtype=np.uint64).astype(U32)
    b = RNG.integers(0, 1 << 32, (501, 5), dtype=np.uint64).astype(U32)
    want = (a.astype(object) @ b.astype(object)) % (1 << 32)
    got = matmul_u32(a, b)
    assert (got.astype(object) == want).all()


def test_squish_unsquish_inverse():
    m = RNG.integers(0, 1 << 10, (10, 35), dtype=np.uint64).astype(U32)
    s = squish(m)
    assert s.shape == (10, 12)
    np.testing.assert_array_equal(unsquish(s, 35), m)


def test_expand_contract_inverse():
    m = RNG.integers(0, 1 << 32, (8, 35), dtype=np.uint64).astype(U32)
    e = expand(m, 552, 4)
    c = contract(e, 552, 4)
    np.testing.assert_array_equal(c, m)


def test_transpose_expand_concat_cols_squish_brute():
    """Check the fused transform against a direct loop implementation."""
    p, delta, x = 97, 5, 2
    rows, cols = 12, 3
    m = RNG.integers(0, 1 << 32, (rows, cols), dtype=np.uint64).astype(U32)
    got = transpose_expand_concat_cols_squish(m, p, delta, x)
    out_rows = cols * delta * x
    out_cols = (rows // x + 3 - 1) // 3
    want = np.zeros((out_rows, out_cols), dtype=U32)
    for j in range(rows):
        for i in range(cols):
            val = int(m[j, i])
            for f in range(delta):
                nv = val % p
                r = (i * delta + f) + cols * delta * (j % x)
                c = j // x
                want[r, c // 3] += U32(nv << (10 * (c % 3)))
                val //= p
    np.testing.assert_array_equal(got, want)


def test_packed_matmuls_match_unsquished():
    rows, cols = 16, 7
    a = RNG.integers(0, 1 << 10, (rows, cols * 3), dtype=np.uint64).astype(U32)
    ap = squish(a)
    b = RNG.integers(0, 1 << 32, (cols * 3, 1), dtype=np.uint64).astype(U32)
    got = mat_mul_vec_packed(ap, b)
    want = matmul_u32(a, b)
    np.testing.assert_array_equal(got, want)

    bt = RNG.integers(0, 1 << 32, (9, cols * 3), dtype=np.uint64).astype(U32)
    got = mat_mul_transposed_packed(ap, bt)
    want = matmul_u32(a, np.ascontiguousarray(bt.T))
    np.testing.assert_array_equal(got, want)


def small_params(num_entries, d=1):
    return pick_params(num_entries, d, SEC_PARAM, LOGQ, lower_bound_m=1)


def build_random_db(num_entries, bits_per_entry, params, planted: dict):
    item_max = 1 << bits_per_entry
    vals = RNG.integers(0, item_max, num_entries, dtype=np.uint64)
    for idx, v in planted.items():
        vals[idx] = v
    db = Db.from_entries(num_entries, bits_per_entry, params, vals.tolist())
    return db, vals


def test_simple_end_to_end():
    num_entries = 1 << 16
    params = small_params(num_entries)
    idx = int(RNG.integers(0, num_entries))
    corr = 1
    db, _ = build_random_db(num_entries, 1, params, {idx: corr})
    assert db.get_elem(idx) == corr

    shared = scheme.init(db.info, params)
    server_state, hint = scheme.setup(db, shared, params)
    assert db.get_elem(idx) == corr     # squished read-back
    client_state, q = scheme.query(idx, shared, params, db.info, RNG)
    ans = scheme.answer(db, [q], server_state, params)
    result = scheme.recover(idx, 0, hint, q, ans, shared, client_state,
                            params, db.info)
    assert result == corr


def test_batched_end_to_end():
    num_entries = 1 << 16
    params = small_params(num_entries)
    i1 = int(RNG.integers(0, num_entries // 2))
    i2 = i1 + num_entries // 2
    db, _ = build_random_db(num_entries, 1, params, {i1: 1, i2: 1})

    shared = scheme.init(db.info, params)
    server_state, hint = scheme.setup(db, shared, params)
    cs1, q1 = scheme.query(i1, shared, params, db.info, RNG)
    cs2, q2 = scheme.query(i2, shared, params, db.info, RNG)
    ans = scheme.answer(db, [q1, q2], server_state, params)
    r1 = scheme.recover(i1, 0, hint, q1, ans, shared, cs1, params, db.info)
    r2 = scheme.recover(i2, 1, hint, q2, ans, shared, cs2, params, db.info)
    assert r1 == 1 and r2 == 1


def test_chunked_end_to_end():
    """The DB-sharding pattern: row-chunked answers, even-indexed responses
    summed (reference doublepir.rs:607-717 / bin/e2e.rs:60-106)."""
    num_entries = 1 << 16
    params = small_params(num_entries)
    i1 = int(RNG.integers(0, num_entries // 2))
    i2 = i1 + num_entries // 2
    db, _ = build_random_db(num_entries, 1, params, {i1: 1, i2: 1})

    shared = scheme.init(db.info, params)
    server_state, hint = scheme.setup(db, shared, params)
    cs1, q1 = scheme.query(i1, shared, params, db.info, RNG)
    cs2, q2 = scheme.query(i2, shared, params, db.info, RNG)
    queries = [q1, q2]

    num_chunks = 2
    batch_sz = db.data.shape[0] // num_chunks
    chunks = [db.data[:batch_sz], db.data[batch_sz:]]

    full = None
    for chunk_idx, slc in enumerate(chunks):
        resp = scheme.answer(db, queries, server_state, params,
                             raw_data=slc, chunk_idx=chunk_idx)
        assert len(resp) == 1 + 2 * num_chunks
        if full is None:
            full = resp
        else:
            for ridx in range(len(resp)):
                if ridx % 2 == 1:
                    continue
                full[ridx] = full[ridx] + resp[ridx]
    r1 = scheme.recover(i1, 0, hint, q1, full, shared, cs1, params, db.info)
    r2 = scheme.recover(i2, 1, hint, q2, full, shared, cs2, params, db.info)
    assert r1 == 1 and r2 == 1


def test_multibyte_entries():
    """Entries wider than log p exercise the ne/x spanning path."""
    num_entries = 1 << 10
    bits = 24
    params = small_params(num_entries, d=bits)
    idx = int(RNG.integers(0, num_entries))
    corr = 0xABCDEF
    db, _ = build_random_db(num_entries, bits, params, {idx: corr})
    assert db.get_elem(idx) == corr
    shared = scheme.init(db.info, params)
    server_state, hint = scheme.setup(db, shared, params)
    assert db.get_elem(idx) == corr
    cs, q = scheme.query(idx, shared, params, db.info, RNG)
    ans = scheme.answer(db, [q], server_state, params)
    result = scheme.recover(idx, 0, hint, q, ans, shared, cs, params, db.info)
    assert result == corr

"""TPU (JAX) Spiral pipeline vs the host (numpy) oracle: every stage must be
bit-exact, and the full protocol must decode byte-identically (the reference's
test strategy, lib/spiral-rs/src/server.rs:787-1072, on our kernels)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdk_tpu import poly, server_host
from sdk_tpu.client import Client, PublicParameters, Query, reorient_reg_ciphertexts
from sdk_tpu.ops import server_jax, spiral_jax as sj
from sdk_tpu.ops.server_jax import SpiralServerJax, _split_pair_np, _join_pair_np
from sdk_tpu.params import (
    get_fast_expansion_testing_params,
    get_no_expansion_testing_params,
)
from sdk_tpu.rng import ChaCha20Rng

U64 = np.uint64


def seeded_client(params, seed=b"\x11" * 32):
    c = Client(params)
    pp = c.generate_keys_from_seed(
        seed, noise_rng=ChaCha20Rng(b"\x12" * 32), pp_seed=b"\x13" * 32)
    return c, pp


def to_dev_ntt(m):
    return jnp.asarray(m.astype(np.uint32))


def test_matmul_mod_matches_host():
    params = get_fast_expansion_testing_params()
    rng = np.random.default_rng(3)
    a64 = np.empty((2, 8, params.crt_count, params.poly_len), dtype=U64)
    b64 = np.empty((8, 1, params.crt_count, params.poly_len), dtype=U64)
    for c, q in enumerate(params.moduli):
        a64[:, :, c] = rng.integers(0, q, a64.shape[:2] + (params.poly_len,), dtype=U64)
        b64[:, :, c] = rng.integers(0, q, b64.shape[:2] + (params.poly_len,), dtype=U64)
    want = poly.multiply(params, a64, b64)
    got = jax.jit(lambda a, b: sj.matmul_mod(params, a, b))(
        to_dev_ntt(a64), to_dev_ntt(b64))
    np.testing.assert_array_equal(np.asarray(got).astype(U64), want)


def test_from_ntt_roundtrip_pairs():
    params = get_fast_expansion_testing_params()
    rng = np.random.default_rng(4)
    raw = rng.integers(0, params.modulus, (3, 2, 1, params.poly_len), dtype=U64)
    ntt_host_val = poly.to_ntt(params, raw.reshape(3 * 2, 1, -1)).reshape(
        3, 2, 1, params.crt_count, params.poly_len)
    f = jax.jit(lambda x: sj.from_ntt(params, x))
    hi, lo = f(to_dev_ntt(ntt_host_val))
    got = _join_pair_np(np.asarray(hi), np.asarray(lo))
    np.testing.assert_array_equal(got, raw)


def test_coefficient_expansion_matches_host():
    params = get_fast_expansion_testing_params()
    client, pp = seeded_client(params)
    rng = ChaCha20Rng(b"\x14" * 32)
    rng_pub = ChaCha20Rng(b"\x15" * 32)
    sigma = poly.raw_zero(params, 1, 1)
    sigma[0, 0, 9] = params.modulus // params.pt_modulus
    ct = client.encrypt_matrix_reg(poly.to_ntt(params, sigma), rng, rng_pub)

    # host oracle
    g = params.g()
    v = [poly.ntt_zero(params, 2, 1) for _ in range(1 << g)]
    v[0] = ct.copy()
    v_neg1 = [poly.to_ntt(params, p.reshape(1, 1, -1))
              for p in params.get_v_neg1_raw()]
    server_host.coefficient_expansion(
        v, g, params.stop_round(), params, pp.v_expansion_left,
        pp.v_expansion_right, v_neg1, params.t_gsw * params.db_dim_2)

    # device
    plan = sj.ExpansionPlan(params)
    left = [to_dev_ntt(m) for m in pp.v_expansion_left]
    right = [to_dev_ntt(m) for m in pp.v_expansion_right]
    f = jax.jit(lambda c: sj.coefficient_expansion(
        params, plan, c, left, right, params.t_gsw * params.db_dim_2))
    got = np.asarray(f(to_dev_ntt(ct))).astype(U64)

    want = np.stack(v)
    np.testing.assert_array_equal(got, want)


def test_firstdim_multiply_matches_host():
    params = get_fast_expansion_testing_params()
    client, _ = seeded_client(params)
    rng = ChaCha20Rng(b"\x16" * 32)
    rng_pub = ChaCha20Rng(b"\x17" * 32)
    dim0 = 1 << params.db_dim_1
    scale_k = params.modulus // params.pt_modulus
    _, db = server_host.generate_random_db_and_get_item(params, 5)
    v_reg = []
    for i in range(dim0):
        val = scale_k if i == 3 else 0
        sigma = poly.to_ntt(params, poly.raw_single_value(params, val))
        v_reg.append(client.encrypt_matrix_reg(sigma, rng, rng_pub))
    v_reor = reorient_reg_ciphertexts(params, v_reg)
    want_list = server_host.multiply_reg_by_database(params, db[0, 0], v_reor)
    want = np.stack(want_list)  # (num_per, 2, 1, crt, n)

    db_dev = server_jax.db_tensor_to_device(params, db)
    q_arr = jnp.asarray(np.stack(
        [np.stack(v_reg)[:, :, 0, c, :] for c in range(2)]
    ).transpose(0, 3, 1, 2).astype(np.uint32))  # (crt, z, dim0, 2)
    f = jax.jit(lambda d, q: sj.firstdim_multiply(params, d, q))
    got = np.asarray(f(db_dev, q_arr)).astype(U64)
    # (crt, z, inst, trials, num_per, 2): take inst 0, trial 0 ->
    # (num_per, 2, 1, crt, z)
    got = got[:, :, 0, 0].transpose(2, 3, 0, 1)[:, :, None, :, :]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("params_fn", [get_fast_expansion_testing_params,
                                       get_no_expansion_testing_params])
def test_full_protocol_device(params_fn):
    from sdk_tpu.arith import log2_ceil

    params = params_fn()
    target_idx = 37 % params.num_items()
    client, pp = seeded_client(params)
    query = client.generate_query(
        target_idx, noise_rng=ChaCha20Rng(b"\x18" * 32), query_seed=b"\x19" * 32)
    query2 = Query.deserialize(params, query.serialize(params))
    pp2 = PublicParameters.deserialize(params, pp.serialize(params))

    corr_item, db = server_host.generate_random_db_and_get_item(params, target_idx)

    srv = SpiralServerJax(params)
    srv.set_db_host_tensor(db)
    response = srv.process_query(pp2, query2)

    # must equal the host oracle byte-for-byte
    want_response = server_host.process_query(params, pp2, query2, db)
    assert response == want_response

    result = client.decode_response(response)
    p_bits = log2_ceil(params.pt_modulus)
    corr = poly.raw_to_bytes(params, corr_item, p_bits, params.modp_words_per_chunk())
    assert result == corr


def _fold_fixture():
    """GSW folding keys from a real direct-upload query, plus shared rng."""
    params = get_no_expansion_testing_params()
    client, _ = seeded_client(params)
    query = client.generate_query(
        5, noise_rng=ChaCha20Rng(b"\x18" * 32), query_seed=b"\x19" * 32)
    v_folding = [poly.to_ntt(params, ct) for ct in query.v_ct]
    v_folding_neg = server_host.get_v_folding_neg(params, v_folding)
    g_ntt = poly.to_ntt(params, poly.build_gadget(
        params, 2, 2 * params.t_gsw)).astype(np.uint32)
    vf_dev = jnp.asarray(np.stack(v_folding).astype(np.uint32))
    vfn_dev = jax.jit(lambda v: sj.get_v_folding_neg(params, v, g_ntt))(vf_dev)
    return params, v_folding, v_folding_neg, vf_dev, vfn_dev


def _engine_fold(params, cts, vf_dev, vfn_dev):
    hi, lo = _split_pair_np(np.stack(cts))
    f = jax.jit(lambda h, l: sj.fold_ciphertexts(
        params, h, l, vf_dev, vfn_dev))
    fh, fl = f(jnp.asarray(hi), jnp.asarray(lo))
    return _join_pair_np(np.asarray(fh), np.asarray(fl))


def test_fold_all_zero_shortcut():
    """Folding a single populated slot must return that slot's ct verbatim —
    the reference's sparse-DB shortcut (lib/server fold.rs:37-44, 'crucial
    for correctness'): a true-zero input bypasses the GSW selection, so no
    key noise is added for absent rows."""
    params, v_folding, v_folding_neg, vf_dev, vfn_dev = _fold_fixture()
    num_per = 1 << params.db_dim_2
    rng = np.random.default_rng(9)
    for planted in (0, 3, num_per - 1):
        item_ct = rng.integers(0, params.modulus,
                               (2, 1, params.poly_len), dtype=U64)
        cts = [np.zeros((2, 1, params.poly_len), dtype=U64)
               for _ in range(num_per)]
        cts[planted] = item_ct.copy()
        host_cts = [c.copy() for c in cts]
        server_host.fold_ciphertexts(params, host_cts, v_folding,
                                     v_folding_neg)
        np.testing.assert_array_equal(host_cts[0], item_ct)
        got = _engine_fold(params, cts, vf_dev, vfn_dev)
        np.testing.assert_array_equal(got, item_ct.reshape(got.shape))


def test_fold_sparse_patterns_match_host():
    """Engine fold must stay bit-exact vs the host oracle for mixed
    populated/zero slot patterns (exercises both the shortcut branches and
    the dense GSW path in one tree)."""
    params, v_folding, v_folding_neg, vf_dev, vfn_dev = _fold_fixture()
    num_per = 1 << params.db_dim_2
    rng = np.random.default_rng(10)
    for pattern in ({1, 4}, {2, 3, 6}, set(range(num_per))):
        cts = [np.zeros((2, 1, params.poly_len), dtype=U64)
               for _ in range(num_per)]
        for k in pattern:
            cts[k] = rng.integers(0, params.modulus,
                                  (2, 1, params.poly_len), dtype=U64)
        host_cts = [c.copy() for c in cts]
        server_host.fold_ciphertexts(params, host_cts, v_folding,
                                     v_folding_neg)
        got = _engine_fold(params, cts, vf_dev, vfn_dev)
        np.testing.assert_array_equal(got, host_cts[0].reshape(got.shape))

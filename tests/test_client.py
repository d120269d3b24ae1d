"""Client serialization round-trips and protocol-stage oracle tests
(mirroring lib/spiral-rs/src/client.rs + server.rs test strategy)."""

import numpy as np
import pytest

from sdk_tpu import poly, server_host
from sdk_tpu.client import Client, PublicParameters, Query
from sdk_tpu.params import (
    get_fast_expansion_testing_params,
    get_no_expansion_testing_params,
    get_short_keygen_params,
)
from sdk_tpu.rng import ChaCha20Rng


def seeded_client(params, seed=b"\x01" * 32):
    c = Client(params)
    pp = c.generate_keys_from_seed(
        seed, noise_rng=ChaCha20Rng(b"\x02" * 32), pp_seed=b"\x03" * 32)
    return c, pp


def dec_reg(params, ct_ntt, client, scale_k):
    dec = poly.from_ntt(params, client.decrypt_matrix_reg(ct_ntt))
    val = int(dec[0, 0, 0])
    if val >= params.modulus // 2:
        val -= params.modulus
    return 0 if round(val / scale_k) == 0 else 1


def test_keygen_secret_key_is_ternary():
    params = get_short_keygen_params()
    client, _ = seeded_client(params)
    threshold = int(10 * params.noise_width)
    sk = client.sk_gsw.reshape(-1)
    for val in sk:
        v = int(val)
        assert v < threshold or (params.modulus - v) < threshold


@pytest.mark.parametrize("params_fn", [get_short_keygen_params,
                                       get_no_expansion_testing_params])
def test_public_parameters_serialization_roundtrip(params_fn):
    params = params_fn()
    _, pp = seeded_client(params)
    ser1 = pp.serialize(params)
    assert len(ser1) == params.setup_bytes()
    de = PublicParameters.deserialize(params, ser1)
    for a, b in zip(pp.v_packing, de.v_packing):
        assert np.array_equal(a, b)
    if pp.v_conversion is not None:
        assert np.array_equal(pp.v_conversion[0], de.v_conversion[0])
        for a, b in zip(pp.v_expansion_left, de.v_expansion_left):
            assert np.array_equal(a, b)
        for a, b in zip(pp.v_expansion_right, de.v_expansion_right):
            assert np.array_equal(a, b)


@pytest.mark.parametrize("params_fn", [get_short_keygen_params,
                                       get_no_expansion_testing_params])
def test_query_serialization_roundtrip(params_fn):
    params = params_fn()
    client, _ = seeded_client(params)
    q = client.generate_query(1, noise_rng=ChaCha20Rng(b"\x04" * 32),
                              query_seed=b"\x05" * 32)
    ser1 = q.serialize(params)
    assert len(ser1) == params.query_bytes()
    de = Query.deserialize(params, ser1)
    ser2 = de.serialize(params)
    assert ser1 == ser2


def test_encrypt_decrypt_reg():
    params = get_fast_expansion_testing_params()
    client, _ = seeded_client(params)
    scale_k = params.modulus // params.pt_modulus
    rng = ChaCha20Rng(b"\x06" * 32)
    rng_pub = ChaCha20Rng(b"\x07" * 32)
    sigma = poly.raw_single_value(params, scale_k)
    ct = client.encrypt_matrix_reg(poly.to_ntt(params, sigma), rng, rng_pub)
    assert dec_reg(params, ct, client, scale_k) == 1
    ct0 = client.encrypt_matrix_reg(
        poly.to_ntt(params, poly.raw_single_value(params, 0)), rng, rng_pub)
    assert dec_reg(params, ct0, client, scale_k) == 0


def test_coefficient_expansion_is_correct():
    params = get_fast_expansion_testing_params()
    client, pp = seeded_client(params)
    rng = ChaCha20Rng(b"\x08" * 32)
    rng_pub = ChaCha20Rng(b"\x09" * 32)
    v = [poly.ntt_zero(params, 2, 1) for _ in range(1 << (params.db_dim_1 + 1))]
    target = 7
    scale_k = params.modulus // params.pt_modulus
    sigma = poly.raw_zero(params, 1, 1)
    sigma[0, 0, target] = scale_k
    v[0] = client.encrypt_matrix_reg(poly.to_ntt(params, sigma), rng, rng_pub)

    v_neg1 = [poly.to_ntt(params, p.reshape(1, 1, -1))
              for p in params.get_v_neg1_raw()]
    server_host.coefficient_expansion(
        v, params.g(), params.stop_round(), params,
        pp.v_expansion_left, pp.v_expansion_right, v_neg1,
        params.t_gsw * params.db_dim_2)

    for i in range(len(v)):
        expected = 1 if i == target else 0
        assert dec_reg(params, v[i], client, scale_k) == expected, i


def test_multiply_reg_by_database_is_correct():
    params = get_fast_expansion_testing_params()
    client, _ = seeded_client(params)
    rng = ChaCha20Rng(b"\x0a" * 32)
    rng_pub = ChaCha20Rng(b"\x0b" * 32)
    dim0 = 1 << params.db_dim_1
    num_per = 1 << params.db_dim_2
    scale_k = params.modulus // params.pt_modulus
    target_idx = 37 % (dim0 * num_per)
    t_dim0, t_num_per = target_idx // num_per, target_idx % num_per

    corr_item, db = server_host.generate_random_db_and_get_item(params, target_idx)

    v_reg = []
    for i in range(dim0):
        val = scale_k if i == t_dim0 else 0
        sigma = poly.to_ntt(params, poly.raw_single_value(params, val))
        v_reg.append(client.encrypt_matrix_reg(sigma, rng, rng_pub))
    from sdk_tpu.client import reorient_reg_ciphertexts
    v_reor = reorient_reg_ciphertexts(params, v_reg)

    out = server_host.multiply_reg_by_database(params, db[0, 0], v_reor)
    dec = poly.from_ntt(params, client.decrypt_matrix_reg(out[t_num_per]))
    from sdk_tpu.arith import rescale_arr
    dec_rescaled = rescale_arr(dec[0, 0], params.modulus, params.pt_modulus)
    assert np.array_equal(dec_rescaled, corr_item[0, 0])


def test_full_protocol_expansion():
    params = get_fast_expansion_testing_params()
    _run_full_protocol(params)


def test_full_protocol_no_expansion():
    params = get_no_expansion_testing_params()
    _run_full_protocol(params)


def _run_full_protocol(params):
    from sdk_tpu.arith import log2_ceil
    target_idx = 37 % params.num_items()
    client, pp = seeded_client(params)
    pp_ser = pp.serialize(params)
    pp2 = PublicParameters.deserialize(params, pp_ser)
    query = client.generate_query(
        target_idx, noise_rng=ChaCha20Rng(b"\x0c" * 32), query_seed=b"\x0d" * 32)
    q_ser = query.serialize(params)
    query2 = Query.deserialize(params, q_ser)

    corr_item, db = server_host.generate_random_db_and_get_item(params, target_idx)
    response = server_host.process_query(params, pp2, query2, db)
    result = client.decode_response(response)

    p_bits = log2_ceil(params.pt_modulus)
    corr = poly.raw_to_bytes(params, corr_item, p_bits, params.modp_words_per_chunk())
    assert len(result) == len(corr)
    assert result == corr

"""Golden-value tests against constants published in the reference's own test
suites (used as test vectors only; cited per value)."""

import numpy as np

from sdk_tpu import ntt_host
from sdk_tpu.arith import get_barrett_crs, rescale, recenter, div2_uint_mod
from sdk_tpu.bitpack import read_arbitrary_bits, write_arbitrary_bits
from sdk_tpu.params import build_ntt_tables, get_test_params
from sdk_tpu.rng import ChaCha20Rng


def test_chacha_zero_key_block0():
    # djb-variant ChaCha20, zero key/nonce/counter — RFC 7539-compatible block
    r = ChaCha20Rng(bytes(32))
    assert r.fill_bytes(16).hex() == "76b8e0ada0f13d90405d6ae55386bd28"


def test_chacha_u64_stream_alignment():
    r1 = ChaCha20Rng(bytes(range(32)))
    r2 = ChaCha20Rng(bytes(range(32)))
    a = r1.next_u64(100)
    b = np.concatenate([r2.next_u64(1) for _ in range(100)])
    assert np.array_equal(a, b)


def test_chacha_fast_path_matches_numpy_blocks():
    # ChaCha20Rng draws keystream through OpenSSL when `cryptography` is
    # importable (rng._chacha20_keystream); the numpy round function stays
    # as the reference. Pin their equivalence across block boundaries and
    # a large counter offset so an OpenSSL variant change cannot silently
    # alter the wire-format streams.
    from sdk_tpu import rng as rng_mod

    seed = bytes(range(32))
    key_words = np.frombuffer(seed, dtype="<u4").astype(np.uint32)
    r = ChaCha20Rng(seed)
    drawn = [r.next_u32_words(7), r.next_u32_words(16 * 3 + 5),
             r.next_u64(100).view(np.uint64)]
    nwords = 7 + (16 * 3 + 5) + 200
    ref = rng_mod.chacha20_blocks(
        key_words, 0, (nwords + 15) // 16).reshape(-1)[:nwords]
    got = np.concatenate([drawn[0], drawn[1],
                          drawn[2].view(np.uint32).reshape(-1)])
    # next_u64 packs (lo, hi) LE word pairs — view as u32 restores stream order
    assert np.array_equal(got, ref)
    if rng_mod._chacha20_keystream is not None:
        raw = rng_mod._chacha20_keystream(seed, 1 << 33, 128)
        ref = rng_mod.chacha20_blocks(key_words, 1 << 33, 2)
        assert raw == ref.astype("<u4").tobytes()


def test_barrett_crs():
    # arith.rs:477-490
    assert get_barrett_crs(268369921) == (16144578669088582089, 68736257792)
    assert get_barrett_crs(249561089) == (10966983149909726427, 73916747789)
    assert get_barrett_crs(66974689739603969) == (7906011006380390721, 275)


def test_div2_uint_mod():
    assert div2_uint_mod(3, 7) == 5  # arith.rs:457-459


def test_ntt_tables_golden():
    # ntt.rs:380-398: REF_VAL xor checksum of the full table set
    tables = build_ntt_tables(2048, (268369921, 249561089))
    assert tables[0][2][0] == 134184961
    assert tables[0][2][1] == 96647580
    x1 = 0
    for i in range(2):
        for j in range(4):
            for k in range(2048):
                x1 ^= int(tables[i][j][k])
    assert x1 == 519370102


def test_ntt_forward_inverse_goldens():
    params = get_test_params()
    v = np.zeros((1, 1, 2, 2048), dtype=np.uint64)
    v[0, 0, :, 0] = 100
    f = ntt_host.ntt_forward(params, v)
    assert f[0, 0, 0, 50] == 100 and f[0, 0, 1, 50] == 100

    v2 = np.full((1, 1, 2, 2048), 100, dtype=np.uint64)
    inv = ntt_host.ntt_inverse(params, v2)
    assert inv[0, 0, 0, 0] == 100 and inv[0, 0, 0, 50] == 0

    rng = np.random.default_rng(0)
    vr = np.stack(
        [rng.integers(0, params.moduli[c], (3, 2, 2048), dtype=np.uint64)
         for c in range(2)], axis=-2)
    rt = ntt_host.ntt_inverse(params, ntt_host.ntt_forward(params, vr))
    assert np.array_equal(rt, vr)


def test_negacyclic_multiplication():
    # poly.rs:732-743: x*100 times x*7 = 700 x^2
    from sdk_tpu import poly
    params = get_test_params()
    m1 = poly.raw_zero(params, 1, 1)
    m2 = poly.raw_zero(params, 1, 1)
    m1[0, 0, 1] = 100
    m2[0, 0, 1] = 7
    m3 = poly.from_ntt(params, poly.multiply(
        params, poly.to_ntt(params, m1), poly.to_ntt(params, m2)))
    assert m3[0, 0, 2] == 700
    # negacyclic wraparound: x^2047 * x = -1
    m1[0, 0, :] = 0; m1[0, 0, 2047] = 1
    m2[0, 0, :] = 0; m2[0, 0, 1] = 1
    m3 = poly.from_ntt(params, poly.multiply(
        params, poly.to_ntt(params, m1), poly.to_ntt(params, m2)))
    assert m3[0, 0, 0] == params.modulus - 1


def test_rescale_recenter():
    assert rescale(0, 1 << 30, 1 << 10) == 0
    for v, f, t in [(12345678, 1 << 30, 1 << 10), (999, 2048, 256)]:
        r = rescale(v, f, t)
        assert 0 <= r < t
    assert recenter(5, 100, 10) == 5


def test_bitpack_roundtrip():
    num_bits = 9
    vals = np.array([(i * 7 + 13) % (1 << num_bits) for i in range(500)],
                    dtype=np.uint64)
    data = bytearray(1024)
    write_arbitrary_bits(data, vals, 3, num_bits)  # unaligned start
    got = [read_arbitrary_bits(data, 3 + i * num_bits, num_bits)
           for i in range(500)]
    assert np.array_equal(np.array(got, dtype=np.uint64), vals)

    from sdk_tpu.bitpack import read_fields
    got2 = read_fields(bytes(data), 3, num_bits, 500)
    assert np.array_equal(got2, vals)


def test_gadget_invert():
    # gadget.rs:79-95
    from sdk_tpu import poly
    params = get_test_params()
    mat = poly.raw_zero(params, 2, 1)
    mat[0, 0, 37] = 3
    mat[1, 0, 37] = 6
    log_q = params.modulus_log2
    result = poly.gadget_invert(params, 2 * log_q, mat)
    assert result[0, 0, 37] == 1
    assert result[2, 0, 37] == 1
    assert result[4, 0, 37] == 0
    assert result[1, 0, 37] == 0
    assert result[3, 0, 37] == 1
    assert result[5, 0, 37] == 1
    assert result[7, 0, 37] == 0


def test_discrete_gaussian_stats():
    from sdk_tpu.discrete_gaussian import DiscreteGaussian
    params = get_test_params()
    dg = DiscreteGaussian(params.noise_width)
    rng = ChaCha20Rng(bytes(32))
    vals = dg.sample_arr(params.modulus, rng, 10000).astype(np.int64)
    vals = np.where(vals >= params.modulus // 2, vals - params.modulus, vals)
    import math
    expected_std = params.noise_width / math.sqrt(2 * math.pi)
    assert abs(vals.mean()) < 5 * expected_std / math.sqrt(10000)
    assert abs(vals.std() - expected_std) < 0.1 * expected_std

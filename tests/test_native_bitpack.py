"""Native C++ bitpack codec vs the numpy implementation."""

import numpy as np
import pytest

from sdk_tpu import bitpack as np_bp
from sdk_tpu import native

RNG = np.random.default_rng(31)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
@pytest.mark.parametrize("num_bits", [8, 10, 20, 22, 28, 56])
def test_native_read_write_match_numpy(num_bits):
    count = 1000
    vals = RNG.integers(0, 1 << num_bits, count, dtype=np.uint64)
    nbytes = (7 + num_bits * count + 64) // 8 + 16

    buf_np = bytearray(nbytes)
    np_bp.write_fields(buf_np, vals, 7, num_bits)
    buf_c = bytearray(nbytes)
    native.write_fields(buf_c, vals, 7, num_bits)
    assert bytes(buf_np) == bytes(buf_c)

    got_np = np_bp.read_fields(bytes(buf_np), 7, min(num_bits, 56), count)
    got_c = native.read_fields(bytes(buf_np), 7, min(num_bits, 56), count)
    np.testing.assert_array_equal(got_np, got_c)
    np.testing.assert_array_equal(got_c, vals)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_write_preserves_surrounding_bits():
    buf_np = bytearray(b"\xff" * 64)
    buf_c = bytearray(b"\xff" * 64)
    vals = np.array([0, 5, 9], dtype=np.uint64)
    np_bp.write_fields(buf_np, vals, 13, 11)
    native.write_fields(buf_c, vals, 13, 11)
    assert bytes(buf_np) == bytes(buf_c)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_rescale_matches_numpy():
    from sdk_tpu.arith import rescale_arr as np_rescale
    from sdk_tpu.params import DEFAULT_MODULI

    Q = DEFAULT_MODULI[0] * DEFAULT_MODULI[1]
    vals = RNG.integers(0, Q, 4096, dtype=np.uint64)
    for out_mod in (1024, 4194304, 268369921):
        got = native.rescale_arr(vals, Q, out_mod)
        want = np_rescale(vals, Q, out_mod)
        np.testing.assert_array_equal(got, want)
    # small-modulus vectorized path too
    vals32 = RNG.integers(0, 1 << 22, 1000, dtype=np.uint64)
    got = native.rescale_arr(vals32, 1 << 22, 256)
    want = np_rescale(vals32, 1 << 22, 256)
    np.testing.assert_array_equal(got, want)

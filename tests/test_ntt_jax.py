"""JAX NTT vs the host (numpy) oracle: word-exact forward/inverse, round
trips, and negacyclic convolution semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from sdk_tpu import ntt_host
from sdk_tpu.ops import ntt_jax
from sdk_tpu.params import get_test_params

PARAMS = get_test_params()
RNG = np.random.default_rng(11)


def rand_stacked(batch=()):
    shape = batch + (PARAMS.crt_count, PARAMS.poly_len)
    out = np.empty(shape, dtype=np.uint64)
    for c in range(PARAMS.crt_count):
        out[..., c, :] = RNG.integers(0, PARAMS.moduli[c], batch + (PARAMS.poly_len,),
                                      dtype=np.uint64)
    return out


def test_forward_matches_host():
    x = rand_stacked((3,))
    want = ntt_host.ntt_forward(PARAMS, x)
    got = jax.jit(lambda a: ntt_jax.ntt_forward(PARAMS, a))(
        jnp.asarray(x.astype(np.uint32)))
    np.testing.assert_array_equal(np.asarray(got).astype(np.uint64), want)


def test_inverse_matches_host():
    x = rand_stacked((2, 2))
    want = ntt_host.ntt_inverse(PARAMS, x)
    got = jax.jit(lambda a: ntt_jax.ntt_inverse(PARAMS, a))(
        jnp.asarray(x.astype(np.uint32)))
    np.testing.assert_array_equal(np.asarray(got).astype(np.uint64), want)


def test_round_trip():
    x = rand_stacked((4,))
    f = jax.jit(lambda a: ntt_jax.ntt_inverse(PARAMS, ntt_jax.ntt_forward(PARAMS, a)))
    got = np.asarray(f(jnp.asarray(x.astype(np.uint32))))
    np.testing.assert_array_equal(got.astype(np.uint64), x)


def test_lazy_input_accepted():
    # inputs < 2^32 (unreduced) must reduce identically to the host oracle
    x64 = RNG.integers(0, 1 << 32, (2, PARAMS.crt_count, PARAMS.poly_len),
                       dtype=np.uint64)
    want = ntt_host.ntt_forward(PARAMS, x64)
    got = jax.jit(lambda a: ntt_jax.ntt_forward(PARAMS, a))(
        jnp.asarray(x64.astype(np.uint32)))
    np.testing.assert_array_equal(np.asarray(got).astype(np.uint64), want)


def test_poly_major_layout_word_exact():
    """The poly-major stage layout (batch in lanes, twiddles per row) must be
    word-identical to the host oracle and the lane layout — forward and
    inverse, including lazy (< 2^32) inputs."""
    x = rand_stacked((5,))
    want_f = ntt_host.ntt_forward(PARAMS, x)
    got_f = jax.jit(lambda a: ntt_jax.ntt_forward(PARAMS, a, layout="poly"))(
        jnp.asarray(x.astype(np.uint32)))
    np.testing.assert_array_equal(np.asarray(got_f).astype(np.uint64), want_f)
    got_i = jax.jit(lambda a: ntt_jax.ntt_inverse(PARAMS, a, layout="poly"))(
        jnp.asarray(want_f.astype(np.uint32)))
    np.testing.assert_array_equal(np.asarray(got_i).astype(np.uint64),
                                  ntt_host.ntt_inverse(PARAMS, want_f))
    lazy = RNG.integers(0, 1 << 32, (2, PARAMS.crt_count, PARAMS.poly_len),
                        dtype=np.uint64)
    want_l = ntt_host.ntt_forward(PARAMS, lazy)
    got_l = jax.jit(lambda a: ntt_jax.ntt_forward(PARAMS, a, layout="poly"))(
        jnp.asarray(lazy.astype(np.uint32)))
    np.testing.assert_array_equal(np.asarray(got_l).astype(np.uint64), want_l)


def test_ntt_chunked_matches_unchunked():
    """Batches above the chunk threshold run as lax.map chunks (keeps the 11
    stages on-chip); results must be identical to the direct form."""
    params = PARAMS
    B = 6144  # > _CHUNK_THRESHOLD, divisible by 2048
    rng = np.random.default_rng(12)
    x = np.empty((B, params.crt_count, params.poly_len), dtype=np.uint32)
    for c, q in enumerate(params.moduli):
        x[:, c] = rng.integers(0, q, (B, params.poly_len), dtype=np.uint64)
    xj = jnp.asarray(x)
    fwd = np.asarray(jax.jit(lambda v: ntt_jax.ntt_forward(params, v))(xj))
    inv = np.asarray(jax.jit(lambda v: ntt_jax.ntt_inverse(params, jnp.asarray(fwd)))(jnp.asarray(fwd)))
    # direct (unchunked) reference on a slice-by-slice basis
    for lo_idx in (0, 2048, B - 2048):
        sl = xj[lo_idx:lo_idx + 8]
        want_f = np.asarray(jax.jit(lambda v: ntt_jax.ntt_forward(params, v))(sl))
        np.testing.assert_array_equal(fwd[lo_idx:lo_idx + 8], want_f)
    np.testing.assert_array_equal(inv % np.uint32(1 << 31), inv)  # reduced
    sl_inv = np.asarray(jax.jit(lambda v: ntt_jax.ntt_inverse(params, v))(jnp.asarray(fwd[:8])))
    np.testing.assert_array_equal(inv[:8], sl_inv)

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

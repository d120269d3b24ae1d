"""Four-step MXU NTT vs the butterfly implementation: word-exact forward
and inverse, round trip, and congruence on lazy inputs."""

import numpy as np
import jax
import jax.numpy as jnp

from sdk_tpu.ops import ntt_fourstep, ntt_jax
from sdk_tpu.params import get_test_params

PARAMS = get_test_params()
RNG = np.random.default_rng(29)


def rand_stacked(batch):
    x = np.empty(batch + (PARAMS.crt_count, PARAMS.poly_len), dtype=np.uint32)
    for c, q in enumerate(PARAMS.moduli):
        x[..., c, :] = RNG.integers(0, q, batch + (PARAMS.poly_len,),
                                    dtype=np.uint64)
    return x


def test_forward_word_exact():
    x = rand_stacked((4,))
    want = np.asarray(jax.jit(lambda a: ntt_jax.ntt_forward(PARAMS, a))(
        jnp.asarray(x)))
    got = np.asarray(jax.jit(lambda a: ntt_fourstep.ntt_forward(PARAMS, a))(
        jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_inverse_word_exact_and_roundtrip():
    x = rand_stacked((3,))
    fwd = np.asarray(jax.jit(lambda a: ntt_jax.ntt_forward(PARAMS, a))(
        jnp.asarray(x)))
    want = np.asarray(jax.jit(lambda a: ntt_jax.ntt_inverse(PARAMS, a))(
        jnp.asarray(fwd)))
    got = np.asarray(jax.jit(lambda a: ntt_fourstep.ntt_inverse(PARAMS, a))(
        jnp.asarray(fwd)))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, x)


def test_lazy_inputs_congruent():
    x64 = RNG.integers(0, 1 << 32, (2, PARAMS.crt_count, PARAMS.poly_len),
                       dtype=np.uint64).astype(np.uint32)
    w = np.asarray(jax.jit(lambda a: ntt_jax.ntt_forward(PARAMS, a))(
        jnp.asarray(x64)))
    g = np.asarray(jax.jit(lambda a: ntt_fourstep.ntt_forward(PARAMS, a))(
        jnp.asarray(x64)))
    for c, q in enumerate(PARAMS.moduli):
        np.testing.assert_array_equal(g[:, c] % np.uint32(q),
                                      w[:, c] % np.uint32(q))

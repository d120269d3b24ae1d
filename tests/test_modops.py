"""Property tests for the uint32 TPU modular-arithmetic primitives against
exact numpy uint64 arithmetic (the host oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdk_tpu.ops import modops
from sdk_tpu.params import DEFAULT_MODULI

RNG = np.random.default_rng(42)
N = 4096


def rand_u32(bound=1 << 32, n=N):
    return RNG.integers(0, bound, n, dtype=np.uint64).astype(np.uint32)


@pytest.mark.parametrize("q", list(DEFAULT_MODULI) + [65537, 12289, (1 << 28) - 57])
def test_mulmod_matches_u64(q):
    a = rand_u32()
    b = rand_u32()
    got = np.asarray(modops.mulmod(jnp.asarray(a), jnp.asarray(b), q))
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) % np.uint64(q)).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_mul32_parts():
    a = rand_u32()
    b = rand_u32()
    hi, lo = modops.mul32_parts(jnp.asarray(a), jnp.asarray(b))
    prod = a.astype(np.uint64) * b.astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(hi), (prod >> np.uint64(32)).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(lo), (prod & np.uint64(0xFFFFFFFF)).astype(np.uint32))


@pytest.mark.parametrize("q", DEFAULT_MODULI)
def test_shoup_mulmod_lazy_bound_and_value(q):
    a = rand_u32()
    for w in [1, 2, q - 1, 12345, q // 2]:
        r = np.asarray(modops.shoup_mulmod_lazy(jnp.asarray(a), w, q))
        assert (r < 2 * q).all()
        want = (a.astype(np.uint64) * np.uint64(w)) % np.uint64(q)
        np.testing.assert_array_equal(r % np.uint32(q), want.astype(np.uint32))


@pytest.mark.parametrize("q", DEFAULT_MODULI)
def test_reduce_u64_pair(q):
    hi = rand_u32()
    lo = rand_u32()
    got = np.asarray(modops.reduce_u64_pair_mod_q(jnp.asarray(hi), jnp.asarray(lo), q))
    v = (hi.astype(object) * (1 << 32)) + lo.astype(object)
    want = np.array([int(x) % q for x in v], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_u64_pair_add_sub_shift_bits():
    a = RNG.integers(0, 1 << 63, N, dtype=np.uint64)
    b = RNG.integers(0, 1 << 63, N, dtype=np.uint64)
    ah, al = jnp.asarray((a >> np.uint64(32)).astype(np.uint32)), jnp.asarray(a.astype(np.uint32))
    bh, bl = jnp.asarray((b >> np.uint64(32)).astype(np.uint32)), jnp.asarray(b.astype(np.uint32))

    sh, sl = modops.u64_add(ah, al, bh, bl)
    s = a + b
    np.testing.assert_array_equal(np.asarray(sh), (s >> np.uint64(32)).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(sl), s.astype(np.uint32))

    dh, dl = modops.u64_sub(ah, al, bh, bl)
    d = a - b
    np.testing.assert_array_equal(np.asarray(dh), (d >> np.uint64(32)).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(dl), d.astype(np.uint32))

    for k in [0, 1, 17, 31, 32, 33, 56, 63]:
        rh, rl = modops.u64_shift_right(ah, al, k)
        r = a >> np.uint64(k)
        np.testing.assert_array_equal(np.asarray(rh), (r >> np.uint64(32)).astype(np.uint32))
        np.testing.assert_array_equal(np.asarray(rl), r.astype(np.uint32))

    for offs, nb in [(0, 20), (13, 28), (40, 24), (56, 8), (0, 32)]:
        f = modops.u64_bits(ah, al, offs, nb)
        want = ((a >> np.uint64(offs)) & np.uint64((1 << nb) - 1)).astype(np.uint32)
        np.testing.assert_array_equal(np.asarray(f), want)


def test_u64_mod_q_and_geq():
    q0, q1 = DEFAULT_MODULI
    Q = q0 * q1
    vals = RNG.integers(0, 1 << 62, N, dtype=np.uint64)
    h = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
    l = jnp.asarray(vals.astype(np.uint32))
    got = np.asarray(modops.u64_mod_q(h, l, q0))
    want = (vals % np.uint64(q0)).astype(np.uint32)
    np.testing.assert_array_equal(got, want)

    geq = np.asarray(modops.u64_geq_const(h, l, Q // 2))
    np.testing.assert_array_equal(geq, vals >= Q // 2)


def test_crt_compose_pair():
    q0, q1 = DEFAULT_MODULI
    Q = q0 * q1
    vals = np.array([RNG.integers(0, Q) for _ in range(N)], dtype=object)
    x0 = jnp.asarray(np.array([int(v) % q0 for v in vals], dtype=np.uint32))
    x1 = jnp.asarray(np.array([int(v) % q1 for v in vals], dtype=np.uint32))
    h, l = modops.crt_compose_pair(x0, x1, q0, q1)
    got = np.asarray(h).astype(object) * (1 << 32) + np.asarray(l).astype(object)
    assert (got == vals).all()

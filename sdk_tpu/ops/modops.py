"""uint32 modular arithmetic for TPU lanes.

TPUs have no 64-bit integer type, so every mod-q operation (q < 2^28 for the
Spiral CRT moduli) is decomposed into uint32 ops:

- full 32x32->64 products via 16-bit limb splits (`mul32_parts`),
- Harvey/Shoup multiplication with a precomputed companion
  w' = floor(w * 2^32 / q) (`shoup_mulmod`) — the same trick the reference
  NTT uses with u64 lanes (lib/spiral-rs/src/ntt.rs:29-37),
- reduction of (hi, lo) u32 pairs mod q (`reduce_u64_pair`),
- 64-bit coefficient-domain values (mod Q = q0*q1 ~ 2^56) carried as
  (hi, lo) u32 pair pytrees (`U64Pair` helpers).

All functions are jnp-traceable (usable under jit and inside Pallas kernels)
and take moduli as *Python ints* so constants fold into the compiled program.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
_M16 = 0xFFFF


def _u(x: int):
    return U32(x & 0xFFFFFFFF)


def shoup_companion(w: int, q: int) -> int:
    """floor(w * 2^32 / q), truncated to 32 bits (host-side precompute)."""
    return ((w << 32) // q) & 0xFFFFFFFF


def mul32_hi(a, b):
    """High 32 bits of the 64-bit product of two uint32 arrays."""
    a = a.astype(U32)
    b = b.astype(U32)
    al = a & _u(_M16)
    ah = a >> U32(16)
    bl = b & _u(_M16)
    bh = b >> U32(16)
    t = al * bl
    k = t >> U32(16)
    t = ah * bl + k          # <= (2^16-1)^2 + (2^16-1) < 2^32
    w1 = t & _u(_M16)
    w2 = t >> U32(16)
    t = al * bh + w1
    k = t >> U32(16)
    return ah * bh + w2 + k


def mul32_parts(a, b):
    """(hi, lo) of the full 64-bit product of uint32 arrays."""
    return mul32_hi(a, b), (a.astype(U32) * b.astype(U32))


def shoup_mulmod_lazy(a, w: int, q: int):
    """a * w mod q with w a Python-int constant, result in [0, 2q).

    Valid for any uint32 a. 'Lazy': caller reduces [0,2q) -> [0,q) when
    needed (cond_sub_q).
    """
    wsh = _u(shoup_companion(w, q))
    hi = mul32_hi(a, wsh)
    return a * _u(w) - hi * _u(q)


def shoup_mulmod_var_lazy(a, w, w_shoup, q: int):
    """a * w mod q where w/w_shoup are *traced* uint32 arrays (precomputed
    companions, e.g. key material prepared once per session). [0, 2q)."""
    hi = mul32_hi(a, w_shoup)
    return a * w - hi * _u(q)


def cond_sub(x, bound: int):
    return jnp.where(x >= _u(bound), x - _u(bound), x)


def cond_sub_q(x, q: int):
    return jnp.where(x >= _u(q), x - _u(q), x)


def reduce_u32_mod_q_lazy(x, q: int):
    """x mod q for any uint32 x, result in [0, 2q). Shoup with w = 1."""
    return shoup_mulmod_lazy(x, 1, q)


def reduce_u32_mod_q(x, q: int):
    return cond_sub_q(reduce_u32_mod_q_lazy(x, q), q)


def reduce_u64_pair_mod_q(hi, lo, q: int):
    """(hi*2^32 + lo) mod q for uint32 pairs, exact result in [0, q)."""
    m32 = (1 << 32) % q
    r1 = shoup_mulmod_lazy(hi, m32, q)       # [0, 2q)
    r2 = reduce_u32_mod_q_lazy(lo, q)        # [0, 2q)
    s = r1 + r2                              # < 4q < 2^30
    s = cond_sub(s, 2 * q)
    return cond_sub_q(s, q)


def mulmod(a, b, q: int):
    """a * b mod q for uint32 arrays (a, b < 2^32), exact in [0, q)."""
    hi, lo = mul32_parts(a, b)
    return reduce_u64_pair_mod_q(hi, lo, q)


def addmod(a, b, q: int):
    return cond_sub_q(a + b, q)


def submod(a, b, q: int):
    return cond_sub_q(a + _u(q) - b, q)


def negmod(a, q: int):
    """q - a; note 0 maps to q (matching reference invert_poly semantics) —
    use submod(0, a) for strict [0,q)."""
    return _u(q) - a


# ---------------------------------------------------------------------------
# 64-bit values as (hi, lo) uint32 pairs — coefficient-domain (mod Q) math
# ---------------------------------------------------------------------------

def u64_add(h1, l1, h2, l2):
    lo = l1 + l2
    carry = (lo < l1).astype(U32)
    return h1 + h2 + carry, lo


def u64_add_const(h1, l1, c: int):
    chi, clo = _u(c >> 32), _u(c & 0xFFFFFFFF)
    lo = l1 + clo
    carry = (lo < l1).astype(U32)
    return h1 + chi + carry, lo


def u64_sub(h1, l1, h2, l2):
    lo = l1 - l2
    borrow = (l1 < l2).astype(U32)
    return h1 - h2 - borrow, lo


def u64_const_sub(c: int, h2, l2):
    """(constant c) - (h2,l2); c a Python int < 2^64."""
    chi, clo = _u(c >> 32), _u(c & 0xFFFFFFFF)
    lo = clo - l2
    borrow = (clo < l2).astype(U32)
    return chi - h2 - borrow, lo


def u64_mul_const(c: int, x):
    """c * x for Python-int c < 2^32 and uint32 x -> (hi, lo)."""
    return mul32_parts(jnp.broadcast_to(_u(c), x.shape), x)


def u64_shift_right(h, l, k: int):
    """Logical right shift of the pair by k (0 <= k < 64)."""
    if k == 0:
        return h, l
    if k < 32:
        lo = (l >> U32(k)) | (h << U32(32 - k))
        hi = h >> U32(k)
        return hi, lo
    if k == 32:
        return jnp.zeros_like(h), h
    return jnp.zeros_like(h), h >> U32(k - 32)


def u64_bits(h, l, bit_offs: int, num_bits: int):
    """Extract the field [bit_offs, bit_offs+num_bits) (num_bits <= 32)."""
    sh_h, sh_l = u64_shift_right(h, l, bit_offs)
    if num_bits == 32:
        return sh_l
    return sh_l & _u((1 << num_bits) - 1)


def u64_geq_const(h, l, c: int):
    chi, clo = _u(c >> 32), _u(c & 0xFFFFFFFF)
    return (h > chi) | ((h == chi) & (l >= clo))


def u64_mod_q(h, l, q: int):
    return reduce_u64_pair_mod_q(h, l, q)


def crt_compose_pair(x0, x1, q0: int, q1: int):
    """CRT-compose residues x0 (mod q0), x1 (mod q1) into (hi, lo) u32 pair
    holding the unique value mod Q = q0*q1 (Garner, as params.crt_compose_2)."""
    inv_q0_mod_q1 = pow(q0, -1, q1)
    d = cond_sub_q(x1 + _u(q1) - cond_sub_q(reduce_u32_mod_q_lazy(x0, q1), q1), q1)
    t = mulmod(d, jnp.broadcast_to(_u(inv_q0_mod_q1), d.shape), q1)
    hi, lo = u64_mul_const(q0, t)
    return u64_add(hi, lo, jnp.zeros_like(x0), x0)

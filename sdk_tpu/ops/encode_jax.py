"""On-device response encode: modulus-switch rescale + bit-pack inside the
serving dispatch, so only wire bytes leave the device (~4.5x smaller fetch
than the raw packed ciphertext pairs — the single-query p50 is fetch-bound
through the host<->device link).

Reference semantics: rescale (lib/spiral-rs/src/arith.rs:429-444) and encode
(lib/server/src/server.rs:101-134); wire layout = write_arbitrary_bits
(lib/spiral-rs/src/util.rs:289-321): fields packed LSB-first into a
little-endian bitstream.

Rescale without any wide division (TPU lanes are 32-bit): for odd q,
    rescale(x, q, c) = floor((x*c + q//2) / q) mod c
(equal to the reference's sign-based truncating form because q is odd, so
ties cannot occur and ceil((N-h)/q) == floor((N+h)/q) for h = q//2).
With N = x*c + q//2:  q * floor(N/q) = N - (N mod q), so
    t = low32(N - (N mod q)) * q^{-1}  (mod 2^32)
is EXACT (odd q is invertible mod 2^32 and t < 2^23). N mod q comes from
the two 28-bit CRT residues via the existing u32 modmul machinery — no
85-bit product or 57-bit divide ever materializes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..arith import log2_ceil
from ..params import Params, Q2_VALUES
from .modops import (
    U32,
    _u,
    addmod,
    cond_sub_q,
    crt_compose_pair,
    reduce_u64_pair_mod_q,
    shoup_mulmod_lazy,
)


def rescale_pair(params: Params, hi, lo, out_mod: int):
    """Elementwise rescale of (hi, lo) u32 pairs holding values in [0, q)
    from q = q0*q1 to out_mod, bit-exact vs arith.rescale. Returns u32."""
    q0, q1 = params.moduli
    q = params.modulus
    h = q // 2
    res = []
    for qc in (q0, q1):
        r = reduce_u64_pair_mod_q(hi, lo, qc)
        v = cond_sub_q(shoup_mulmod_lazy(r, out_mod % qc, qc), qc)
        v = addmod(v, jnp.broadcast_to(_u(h % qc), v.shape), qc)
        res.append(v)
    _, nm_lo = crt_compose_pair(res[0], res[1], q0, q1)   # N mod q, low half
    low32_n = lo * _u(out_mod) + _u(h)                    # N mod 2^32
    qinv = pow(q, -1, 1 << 32)
    t = (low32_n - nm_lo) * _u(qinv)                      # floor(N/q) <= out
    return jnp.where(t >= _u(out_mod), t - _u(out_mod), t)


class ResponseEncodePlan:
    """Precomputed bit-pack schedule for one parameter set.

    encode(p_hi, p_lo) is jnp-traceable: rescales row 0 of each packed
    instance to q2 and the remaining rows to q1 = 4p, then packs the
    q2_bits-/q1_bits-wide fields into little-endian u32 words via a static
    gather table (one (value_index, bit_index) pair per stream bit). The
    u32 word array's little-endian bytes ARE the wire response.
    """

    def __init__(self, params: Params):
        self.params = params
        self.q1_val = 4 * params.pt_modulus
        self.q1_bits = log2_ceil(self.q1_val)
        self.q2_val = Q2_VALUES[params.q2_bits]
        self.q2_bits = params.q2_bits
        n, z, inst = params.n, params.poly_len, params.instances

        widths = np.tile(
            np.concatenate([
                np.full(n * z, self.q2_bits, dtype=np.int64),
                np.full(n * n * z, self.q1_bits, dtype=np.int64)]),
            inst)
        num_bits = int(widths.sum())
        self.num_bytes = ((num_bits + 63) // 64) * 8
        nbits_pad = self.num_bytes * 8

        src_idx = np.repeat(np.arange(widths.size, dtype=np.int32), widths)
        offs = np.cumsum(widths) - widths
        src_bit = (np.arange(num_bits, dtype=np.int64)
                   - np.repeat(offs, widths)).astype(np.int32)
        pad = nbits_pad - num_bits
        if pad:
            # sentinel: index of an appended zero value
            src_idx = np.concatenate(
                [src_idx, np.full(pad, widths.size, dtype=np.int32)])
            src_bit = np.concatenate([src_bit, np.zeros(pad, dtype=np.int32)])
        self._src_idx = jnp.asarray(src_idx)
        self._src_bit = jnp.asarray(src_bit.astype(np.uint32))

    def encode(self, p_hi, p_lo):
        """p_hi/p_lo: (instances, n+1, n, poly_len) u32 pairs in [0, q).
        Returns the response as a u32 word array (little-endian bytes)."""
        params = self.params
        inst = params.instances
        row0 = rescale_pair(params, p_hi[:, 0], p_lo[:, 0], self.q2_val)
        rest = rescale_pair(params, p_hi[:, 1:], p_lo[:, 1:], self.q1_val)
        vals = jnp.concatenate(
            [row0.reshape(inst, -1), rest.reshape(inst, -1)],
            axis=1).reshape(-1)
        vals = jnp.concatenate([vals, jnp.zeros((1,), dtype=U32)])
        bits = (jnp.take(vals, self._src_idx) >> self._src_bit) & U32(1)
        words = (bits.reshape(-1, 32)
                 << jnp.arange(32, dtype=U32)).sum(axis=1, dtype=U32)
        return words

    def to_bytes(self, words) -> bytes:
        """Host side: device word array -> wire bytes."""
        out = np.asarray(words).astype("<u4").tobytes()
        assert len(out) == self.num_bytes
        return out

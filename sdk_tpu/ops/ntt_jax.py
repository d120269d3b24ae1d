"""Negacyclic NTT on TPU (JAX/XLA), bit-identical to the host oracle
(sdk_tpu.ntt_host, reference lib/spiral-rs/src/ntt.rs).

Harvey butterflies with Shoup-scaled twiddles in uint32 lanes: the reference
computes `w*y - mulhi32(y, w')*q` in u64; both terms' true difference is
< 2q < 2^30, so wrapping uint32 arithmetic yields the identical value.
Lazy reduction keeps values in [0, 4q) (forward) / [0, 2q) (inverse),
exactly like the reference, so outputs match word-for-word.

Layout: uint32 arrays shaped (..., crt_count, poly_len); batch dims lead.
All stage structure is static (poly_len fixed at trace time) so the 11
stages unroll into one fused XLA program.

Two stage layouts, selected by SDK_TPU_NTT_LAYOUT (or per-call):

- "lane": butterflies along the minor poly axis. The 7 stages with
  half-block size t < 128 interleave elements *within* 128-lane
  vector registers, so each costs intra-register lane shuffles.
- "poly" (default): transpose to (poly_len, batch) once, run all stages
  with the batch filling the 128 lanes, transpose back. Every butterfly is
  then a whole-row op (twiddles constant along lanes, broadcast per row)
  and the per-stage data movement is row selection — no lane crossings at
  any stage — at the price of two transposes per call.

Both produce word-identical outputs (same arithmetic, same order);
tools/profile_ntt_layout.py races them on device. Measured (v5e, round 5):
standalone forward NTT is a wash (0.98–1.04x across batch 256–14336), but
the fold-fused context — where the digit NTTs feed the gadget matmul —
runs 12% faster poly-major (49.6 vs 56.4 ms p50 full single-query fold at
the 1 GiB (9,6) inst4 shape, bit-exact), so "poly" is the default.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..params import Params
from .modops import U32, mul32_hi

_TABLE_CACHE: dict = {}

# Stage layout: "poly" (poly-major: batch in lanes — measured 12% faster
# in the fold-fused context) or "lane" (butterflies along the minor poly
# axis). See module docstring.
DEFAULT_LAYOUT = os.environ.get("SDK_TPU_NTT_LAYOUT", "poly")


def get_tables_u32(params: Params):
    """Per-channel (w, w', w_inv, w_inv') tables as numpy uint32 arrays."""
    key = (params.poly_len, params.moduli)
    if key not in _TABLE_CACHE:
        out = []
        for c in range(params.crt_count):
            tbl = params.ntt_tables[c]
            out.append(tuple(t.astype(np.uint32) for t in tbl))
        _TABLE_CACHE[key] = out
    return _TABLE_CACHE[key]


def _fwd_channel(x, w_tbl: np.ndarray, wp_tbl: np.ndarray, q: int):
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    two_q = U32(2 * q)
    batch = x.shape[:-1]
    op = x.astype(U32)
    for mm in range(log_n):
        m = 1 << mm
        t = n >> (mm + 1)
        v = op.reshape(batch + (m, 2, t))
        xs = v[..., 0, :]
        ys = v[..., 1, :]
        w = jnp.asarray(w_tbl[m : 2 * m].reshape(m, 1))
        wp = jnp.asarray(wp_tbl[m : 2 * m].reshape(m, 1))
        curr_x = jnp.where(xs >= two_q, xs - two_q, xs)
        q_tmp = mul32_hi(ys, jnp.broadcast_to(wp, ys.shape))
        q_new = w * ys - q_tmp * U32(q)
        nx = curr_x + q_new
        ny = curr_x + (two_q - q_new)
        op = jnp.stack([nx, ny], axis=-2).reshape(batch + (n,))
    op = jnp.where(op >= two_q, op - two_q, op)
    op = jnp.where(op >= U32(q), op - U32(q), op)
    return op


def _inv_channel(x, w_tbl: np.ndarray, wp_tbl: np.ndarray, q: int):
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    two_q = U32(2 * q)
    batch = x.shape[:-1]
    op = x.astype(U32)
    for mm in reversed(range(log_n)):
        h = 1 << mm
        t = n >> (mm + 1)
        v = op.reshape(batch + (h, 2, t))
        xs = v[..., 0, :]
        ys = v[..., 1, :]
        w = jnp.asarray(w_tbl[h : 2 * h].reshape(h, 1))
        wp = jnp.asarray(wp_tbl[h : 2 * h].reshape(h, 1))
        t_tmp = two_q - ys + xs
        curr_x = xs + ys - jnp.where((xs << U32(1)) >= t_tmp, two_q, U32(0))
        h_tmp = mul32_hi(t_tmp, jnp.broadcast_to(wp, t_tmp.shape))
        nx = (curr_x + U32(q) * (t_tmp & U32(1))) >> U32(1)
        ny = w * t_tmp - h_tmp * U32(q)
        op = jnp.stack([nx, ny], axis=-2).reshape(batch + (n,))
    op = jnp.where(op >= two_q, op - two_q, op)
    op = jnp.where(op >= U32(q), op - U32(q), op)
    return op


def _fwd_channel_poly(x, w_tbl: np.ndarray, wp_tbl: np.ndarray, q: int):
    """Poly-major variant of _fwd_channel: identical arithmetic on a
    (poly_len, batch) working layout — twiddles broadcast per ROW, so no
    stage touches the lane axis. Word-identical outputs."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    two_q = U32(2 * q)
    batch = x.shape[:-1]
    op = x.astype(U32).reshape(-1, n).T          # (n, B)
    B = op.shape[1]
    for mm in range(log_n):
        m = 1 << mm
        t = n >> (mm + 1)
        v = op.reshape(m, 2, t, B)
        xs = v[:, 0]
        ys = v[:, 1]
        w = jnp.asarray(w_tbl[m : 2 * m].reshape(m, 1, 1))
        wp = jnp.asarray(wp_tbl[m : 2 * m].reshape(m, 1, 1))
        curr_x = jnp.where(xs >= two_q, xs - two_q, xs)
        q_tmp = mul32_hi(ys, jnp.broadcast_to(wp, ys.shape))
        q_new = w * ys - q_tmp * U32(q)
        nx = curr_x + q_new
        ny = curr_x + (two_q - q_new)
        op = jnp.stack([nx, ny], axis=1).reshape(n, B)
    op = jnp.where(op >= two_q, op - two_q, op)
    op = jnp.where(op >= U32(q), op - U32(q), op)
    return op.T.reshape(batch + (n,))


def _inv_channel_poly(x, w_tbl: np.ndarray, wp_tbl: np.ndarray, q: int):
    """Poly-major variant of _inv_channel (see _fwd_channel_poly)."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    two_q = U32(2 * q)
    batch = x.shape[:-1]
    op = x.astype(U32).reshape(-1, n).T          # (n, B)
    B = op.shape[1]
    for mm in reversed(range(log_n)):
        h = 1 << mm
        v = op.reshape(h, 2, n >> (mm + 1), B)
        xs = v[:, 0]
        ys = v[:, 1]
        w = jnp.asarray(w_tbl[h : 2 * h].reshape(h, 1, 1))
        wp = jnp.asarray(wp_tbl[h : 2 * h].reshape(h, 1, 1))
        t_tmp = two_q - ys + xs
        curr_x = xs + ys - jnp.where((xs << U32(1)) >= t_tmp, two_q, U32(0))
        h_tmp = mul32_hi(t_tmp, jnp.broadcast_to(wp, t_tmp.shape))
        nx = (curr_x + U32(q) * (t_tmp & U32(1))) >> U32(1)
        ny = w * t_tmp - h_tmp * U32(q)
        op = jnp.stack([nx, ny], axis=1).reshape(n, B)
    op = jnp.where(op >= two_q, op - two_q, op)
    op = jnp.where(op >= U32(q), op - U32(q), op)
    return op.T.reshape(batch + (n,))


# Above this many polys per call, the 11 unrolled stages stop fitting
# on-chip and every stage round-trips HBM (measured 2.17 us/poly at
# batch 16384 and ~2x degradation already at 3584, vs 0.47 at 2048 on one
# v5e). Processing the batch in lax.map chunks keeps each chunk's stages
# resident: 35.6 -> 14.0 ms at batch 16384. Non-divisible batches are
# zero-padded to the next chunk multiple (the padded polys' work is bounded
# by one chunk and far cheaper than spilling).
_CHUNK_THRESHOLD = 1024
_CHUNK_SIZES = (1024, 512)


def _maybe_chunked(fn, x):
    batch = int(np.prod(x.shape[:-2])) if x.ndim > 2 else 1
    if batch <= _CHUNK_THRESHOLD:
        return fn(x)
    import jax

    for ch in _CHUNK_SIZES:
        if batch % ch == 0:
            flat = x.reshape((batch // ch, ch) + x.shape[-2:])
            out = jax.lax.map(fn, flat)
            return out.reshape(x.shape[:-2] + out.shape[-2:])
    ch = 1024
    pad = (-batch) % ch
    flat = x.reshape((batch,) + x.shape[-2:])
    flat = jnp.pad(flat, ((0, pad), (0, 0), (0, 0)))
    out = jax.lax.map(fn, flat.reshape((-1, ch) + x.shape[-2:]))
    out = out.reshape((batch + pad,) + out.shape[-2:])[:batch]
    return out.reshape(x.shape[:-2] + out.shape[-2:])


def ntt_forward(params: Params, x, layout: str | None = None):
    """x: (..., crt_count, poly_len) uint32 (values < 2^32, reduced lazily)."""
    tables = get_tables_u32(params)
    fwd = _fwd_channel_poly if (layout or DEFAULT_LAYOUT) == "poly" \
        else _fwd_channel

    def run(v):
        chans = []
        for c in range(params.crt_count):
            w, wp, _, _ = tables[c]
            chans.append(fwd(v[..., c, :], w, wp, params.moduli[c]))
        return jnp.stack(chans, axis=-2)

    return _maybe_chunked(run, x)


def ntt_inverse(params: Params, x, layout: str | None = None):
    """x: (..., crt_count, poly_len) uint32 → coefficients in [0, q_c)."""
    tables = get_tables_u32(params)
    inv = _inv_channel_poly if (layout or DEFAULT_LAYOUT) == "poly" \
        else _inv_channel

    def run(v):
        chans = []
        for c in range(params.crt_count):
            _, _, wi, wip = tables[c]
            chans.append(inv(v[..., c, :], wi, wip, params.moduli[c]))
        return jnp.stack(chans, axis=-2)

    return _maybe_chunked(run, x)

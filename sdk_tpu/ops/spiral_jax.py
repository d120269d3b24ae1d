"""Spiral server compute pipeline on TPU (JAX/XLA).

Re-implements the reference server pipeline (lib/spiral-rs/src/server.rs,
lib/server/src/compute/*) as one jit-compiled program over uint32 tensors:

  expand_query  : automorphism-based coefficient expansion + Regev->GSW
  first-dim mul : encrypted-query x DB matvec -> 7-bit-limb int8 matmuls (MXU)
  fold          : GSW external products over db_dim_2 rounds
  pack          : recombine n*n scalar cts into one matrix ct

Bit-exact against the host oracle (sdk_tpu.server_host); every value is
carried either as per-CRT-channel uint32 residues (NTT domain) or as
(hi, lo) uint32 pairs for 64-bit coefficient-domain values mod Q = q0*q1.

Layout conventions (batch dims lead, poly axis last):
  NTT matrix   : (rows, cols, crt, poly_len) uint32
  raw matrix   : pair of (rows, cols, poly_len) uint32 (hi, lo)
  DB tensor    : (crt, NUM_LIMBS, poly_len, instances, trials, num_per, dim0)
                 int8 7-bit limb planes (see firstdim_multiply)
  firstdim qry : (crt, poly_len, dim0, 2) uint32
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

import os

from ..params import Params
from . import modops
from .modops import (
    U32,
    cond_sub,
    cond_sub_q,
    crt_compose_pair,
    mulmod,
    reduce_u32_mod_q,
    reduce_u32_mod_q_lazy,
    reduce_u64_pair_mod_q,
    shoup_mulmod_lazy,
    u64_add,
    u64_bits,
    u64_const_sub,
)

# NTT: 32-bit-lane Harvey butterflies with batch chunking (ntt_jax). A
# four-step MXU (matmul) formulation existed as a bit-exact alternative but
# profiled SLOWER on-device at every batch size (2.1-3.9 vs 0.5-0.9 us/poly
# roundtrip at batches 256..16384 on one v5e) and was removed — the limb
# matmuls cost more than the VPU butterflies for 2048-pt transforms.
from .ntt_jax import ntt_forward, ntt_inverse

LIMB_BITS = 7
NUM_LIMBS = 4  # 4 x 7 = 28 bits covers both CRT moduli (q < 2^28)


# ---------------------------------------------------------------------------
# domain conversions
# ---------------------------------------------------------------------------

def to_ntt(params: Params, hi, lo):
    """raw (hi, lo) pairs (..., poly_len) -> NTT (..., crt, poly_len)."""
    chans = [reduce_u64_pair_mod_q(hi, lo, q) for q in params.moduli]
    return ntt_forward(params, jnp.stack(chans, axis=-2))


def to_ntt_no_reduce(params: Params, digits):
    """digits (..., poly_len) u32 (< 4q) -> NTT, copied into every channel
    unreduced (reference poly.rs:625-638)."""
    stacked = jnp.stack([digits] * params.crt_count, axis=-2)
    return ntt_forward(params, stacked)


def from_ntt(params: Params, x):
    """NTT (..., crt, poly_len) -> raw (hi, lo) pairs, CRT-composed."""
    coeffs = ntt_inverse(params, x)
    q0, q1 = params.moduli
    return crt_compose_pair(coeffs[..., 0, :], coeffs[..., 1, :], q0, q1)


# ---------------------------------------------------------------------------
# modular matmul over NTT-domain matrices (small dims; VPU)
# ---------------------------------------------------------------------------

def _sum_mod(t, axis: int, q: int):
    """Sum over `axis` of values < q, exact mod q. Chunks of 8 keep partial
    sums < 8q < 2^31."""
    k = t.shape[axis]
    while k > 1:
        g = min(8, k)
        pad = (-k) % g
        if pad:
            widths = [(0, 0)] * t.ndim
            widths[axis] = (0, pad)
            t = jnp.pad(t, widths)
        shape = list(t.shape)
        shape[axis : axis + 1] = [(k + pad) // g, g]
        t = t.reshape(shape).sum(axis=axis + 1, dtype=U32)
        t = reduce_u32_mod_q(t, q)
        k = t.shape[axis]
    return jnp.take(t, 0, axis=axis)


def matmul_mod(params: Params, a, b):
    """NTT-domain modular matmul.

    a: (ra, k, crt, n) — or a (w, w_shoup) tuple of such arrays for
    session-fixed key material with host-precomputed Shoup companions
    floor(w * 2^32 / q_c) (prepared in server_jax.pp_to_device), which
    replaces the generic 64-bit mulmod with one mulhi per term.
    b: (..., k, cb, crt, n) with optional leading batch dims.
    `a` may also carry leading batch dims of its own (ndim > 4); they align
    with the FIRST dims of b's batch (per-query key material in the batched
    fold: a (NQ, ra, k, crt, n) against b (NQ, IT, npr, k, cb, crt, n)).
    Returns (..., ra, cb, crt, n), canonical in [0, q_c).
    """
    from .modops import shoup_mulmod_var_lazy

    a_shoup = None
    if isinstance(a, tuple):
        a, a_shoup = a
    batch = b.shape[:-4]
    ab = a.ndim - 4                             # leading batch dims of a
    assert a.shape[:ab] == batch[:ab]
    ra, k = a.shape[ab], a.shape[ab + 1]
    cb = b.shape[-3]
    out_ch = []
    for c, q in enumerate(params.moduli):
        ac = a[..., c, :]                       # (*abatch, ra, k, n)
        bc = b[..., c, :]                       # (..., k, cb, n)
        shape = batch + (ra, k, cb, ac.shape[-1])
        a_bshape = batch[:ab] + (1,) * (len(batch) - ab) \
            + (ra, k, 1, ac.shape[-1])
        ax = jnp.broadcast_to(ac.reshape(a_bshape), shape)
        bx = jnp.broadcast_to(
            bc.reshape(batch + (1, k, cb, bc.shape[-1])), shape)
        if a_shoup is not None:
            sx = jnp.broadcast_to(
                a_shoup[..., c, :].reshape(a_bshape), shape)
            t = cond_sub_q(shoup_mulmod_var_lazy(bx, ax, sx, q), q)
        else:
            t = mulmod(ax, bx, q)
        out_ch.append(_sum_mod(t, axis=len(batch) + 1, q=q))
    return jnp.stack(out_ch, axis=-2)


def shoup_companion_arr(params: Params, w: np.ndarray) -> np.ndarray:
    """Host precompute: floor(w * 2^32 / q_c) per channel for an NTT matrix
    (..., crt, n) with values < q_c < 2^28 (fits u64 shifts)."""
    out = np.empty_like(w, dtype=np.uint64)
    for c, q in enumerate(params.moduli):
        out[..., c, :] = (w[..., c, :].astype(np.uint64) << np.uint64(32)) \
            // np.uint64(q)
    return out.astype(np.uint32)


def scalar_mulmod(params: Params, s, b):
    """s: (crt, n) NTT scalar poly; b: (..., crt, n). Pointwise product."""
    out_ch = []
    for c, q in enumerate(params.moduli):
        out_ch.append(mulmod(jnp.broadcast_to(s[c], b[..., c, :].shape),
                             b[..., c, :], q))
    return jnp.stack(out_ch, axis=-2)


def add_mod(params: Params, a, b):
    out_ch = []
    for c, q in enumerate(params.moduli):
        out_ch.append(cond_sub_q(a[..., c, :] + b[..., c, :], q))
    return jnp.stack(out_ch, axis=-2)


# ---------------------------------------------------------------------------
# raw-domain ops on (hi, lo) pairs
# ---------------------------------------------------------------------------

def automorph_tables(params: Params, t: int):
    """Host-precomputed gather permutation + negation mask for x -> x^t
    (reference poly.rs:393-405 scatter, inverted into a gather)."""
    n = params.poly_len
    perm = np.zeros(n, dtype=np.int32)
    neg = np.zeros(n, dtype=bool)
    for i in range(n):
        num = (i * t) // n
        rem = (i * t) % n
        perm[rem] = i
        neg[rem] = (num % 2) == 1
    return perm, neg


def automorph_pair(params: Params, hi, lo, perm: np.ndarray, neg: np.ndarray):
    """Apply the automorphism to raw pairs; negation is Q - x (0 -> Q,
    matching reference invert semantics inside automorph_poly)."""
    g_hi = jnp.take(hi, jnp.asarray(perm), axis=-1)
    g_lo = jnp.take(lo, jnp.asarray(perm), axis=-1)
    n_hi, n_lo = u64_const_sub(params.modulus, g_hi, g_lo)
    m = jnp.asarray(neg)
    return jnp.where(m, n_hi, g_hi), jnp.where(m, n_lo, g_lo)


def gadget_digits(params: Params, hi, lo, out_rows: int, rdim: int):
    """G^-1: decompose (..., rdim, cols, n) pairs into (..., out_rows, cols, n)
    base-2^bits_per digits (reference gadget.rs:34-60)."""
    num_elems = out_rows // rdim
    bits_per = _get_bits_per(params, num_elems)
    pieces = []
    for k in range(num_elems):
        bit_offs = min(k * bits_per, 64)
        if bit_offs >= 64:
            pieces.append(jnp.zeros_like(lo))
        else:
            nb = min(bits_per, 32)
            pieces.append(u64_bits(hi, lo, bit_offs, nb))
    # interleave: out[k*rdim + r] = piece_k[r]
    stacked = jnp.stack(pieces, axis=-4)      # (..., num_elems, rdim, cols, n)
    shape = stacked.shape[:-4] + (out_rows,) + stacked.shape[-2:]
    return stacked.reshape(shape)


def _get_bits_per(params: Params, dim: int) -> int:
    if dim == params.modulus_log2:
        return 1
    return int(params.modulus_log2 / dim) + 1


def invert_raw_pair(params: Params, hi, lo):
    """Q - x on pairs (0 -> Q, as reference invert_poly)."""
    return u64_const_sub(params.modulus, hi, lo)


# ---------------------------------------------------------------------------
# first-dimension multiply: 7-bit-limb int8 matmuls on the MXU
# ---------------------------------------------------------------------------

def _to_limbs_i8(x, axis_new: int = -1):
    """uint32 (< 2^28) -> NUM_LIMBS int8 limbs of LIMB_BITS bits."""
    limbs = [((x >> U32(LIMB_BITS * k)) & U32((1 << LIMB_BITS) - 1)).astype(jnp.int8)
             for k in range(NUM_LIMBS)]
    return limbs


def db_limbs_host(params: Params, db_u32: np.ndarray) -> np.ndarray:
    """Host-side limb decompose: (..., ) uint32 -> (NUM_LIMBS, ...) int8
    stacked on a NEW leading axis (7-bit limbs)."""
    return np.stack(
        [((db_u32 >> np.uint32(LIMB_BITS * k)) & np.uint32(127)).astype(np.int8)
         for k in range(NUM_LIMBS)])


class CompactDb(NamedTuple):
    """O(populated) device DB (reference lib/server/src/db/sparse_db.rs:1-48,
    which stores only populated polys; here: only populated first-dim
    columns, bucketed per num_per bin).

    planes: tuple of crt*NUM_LIMBS int8 arrays
            (z, inst, trials, num_per, cap_bin) — per num_per bin, up to
            cap_bin populated columns' limb values, zero where unoccupied
            (zero columns contribute exactly zero, so unoccupied slots
            never affect results).
    idx_j:  (num_per, cap_bin) int32 — each slot's dim0 coordinate
            (0 where unoccupied; harmless, see above).

    cap_bin is capacity-quantized (grown in powers of two by the host-side
    buffer) so jit retraces are bounded; cap_bin <= dim0 always (a bin holds
    at most dim0 items), so compact never exceeds the dense footprint.
    NamedTuple => a JAX pytree, so it passes through jit directly.
    """

    planes: tuple
    idx_j: object


def compact_db_empty(params: Params, cap_bin: int = 8) -> CompactDb:
    """Empty compact DB: O(num_per * cap_bin) HBM instead of the full
    2^(nu_1+nu_2) space."""
    num_per = 1 << params.db_dim_2
    shape = (params.poly_len, params.instances, params.n * params.n,
             num_per, cap_bin)
    planes = tuple(jnp.zeros(shape, dtype=jnp.int8)
                   for _ in range(params.crt_count * NUM_LIMBS))
    return CompactDb(planes, jnp.zeros((num_per, cap_bin), dtype=jnp.int32))


_COMPACT_CAP_CHUNK = 64  # slot-axis chunk; see fusion-cliff note below


def _firstdim_multiply_compact(params: Params, db: CompactDb, q_arr,
                               q_transposed: bool = False):
    """Compact first-dim multiply: gather each bin's populated query columns
    (idx_j) and contract over the per-bin slot axis. Limb products, weight
    regrouping and Shoup recombination are identical to the dense path on
    identically-valued int32 partial sums (unoccupied slots contribute
    exactly zero), so outputs are bit-identical to dense firstdim_multiply
    on the equivalent dense tensor. Per-bin sums span <= cap_bin <= dim0
    terms — the same int32 bound as dense.

    q_transposed=True takes the batched serving path's pad-free flat
    carrier layout (crt, z, R, dim0) (see firstdim_multiply_qT); the
    gathered per-bin columns land in the same (z, npr, cap, L*R) order
    either way, so everything downstream is shared and bit-identical."""
    planes, idx_j = db.planes, db.idx_j
    Z, inst, trials, npr, cap = planes[0].shape
    R = q_arr.shape[-2] if q_transposed else q_arr.shape[-1]
    out_ch = []
    for c, q in enumerate(params.moduli):
        if q_transposed:
            q_limbs = _to_limbs_i8(q_arr[c])             # each (z, R, dim0)
            q_stack = jnp.concatenate(q_limbs, axis=-2)  # (z, L*R, dim0)
            q_g = jnp.transpose(jnp.take(q_stack, idx_j, axis=-1),
                                (0, 2, 3, 1))            # (z, npr, cap, L*R)
        else:
            q_limbs = _to_limbs_i8(q_arr[c])             # each (z, dim0, R)
            q_stack = jnp.concatenate(q_limbs, axis=-1)  # (z, dim0, L*R)
            q_g = jnp.take(q_stack, idx_j, axis=1)       # (z, npr, cap, L*R)
        # broadcast-multiply + reduce over the slot axis, NOT an einsum:
        # the per-bin contraction makes dot_general lower to ~npr*z tiny
        # batched GEMMs with a fixed ~30 ms overhead (measured flat in cap
        # on v5e), while the explicit mul+sum fuses on the VPU and scales
        # with the compact bytes actually read. int32 is exact: products
        # <= 127^2, summed over cap <= dim0 terms (same bound as dense).
        qg32 = q_g.astype(jnp.int32)[:, None, None]      # (z,1,1,npr,cap,L*R)
        # chunk the slot axis so the fused mul+reduce intermediate stays
        # small enough for XLA to keep on-chip: unchunked, cap >= 128 at
        # the 1 GiB shape falls off a 25x cliff (4->21 ms scaling up to
        # cap 64, then 517 ms at 128 — the product stops fusing)
        parts = []
        for k in range(NUM_LIMBS):
            d = planes[c * NUM_LIMBS + k].astype(jnp.int32)
            acc_p = None
            for s0 in range(0, cap, _COMPACT_CAP_CHUNK):
                s1 = min(cap, s0 + _COMPACT_CAP_CHUNK)
                t = jnp.sum(d[..., s0:s1, None] * qg32[..., s0:s1, :],
                            axis=-2)
                acc_p = t if acc_p is None else acc_p + t
            parts.append(acc_p)
        partials = [None] * (2 * NUM_LIMBS - 1)
        for k in range(NUM_LIMBS):
            for l in range(NUM_LIMBS):
                m = parts[k][..., l * R : (l + 1) * R]
                s = k + l
                partials[s] = m if partials[s] is None else partials[s] + m
        acc = None
        for s, p in enumerate(partials):
            term = shoup_mulmod_lazy(p.astype(U32), (1 << (LIMB_BITS * s)) % q, q)
            acc = term if acc is None else acc + term   # < 14q < 2^32
        acc = reduce_u32_mod_q(acc, q)
        out_ch.append(acc)
    return jnp.stack(out_ch, axis=0)                     # (crt,z,a,t,npr,R)


def _combine_weight_groups(zs, R: int, q: int):
    """Epilogue of the kconcat scan GEMM: its output columns arrive already
    weight-grouped (block s = the exact int32 sum over all k+l=s limb
    pairs), so recombination is one Shoup multiply per weight — no
    cross-GEMM regrouping traffic. Lazy sum < 14q < 2^32."""
    acc = None
    for s in range(2 * NUM_LIMBS - 1):
        p = zs[..., s * R : (s + 1) * R].astype(U32)
        term = shoup_mulmod_lazy(p, (1 << (LIMB_BITS * s)) % q, q)
        acc = term if acc is None else acc + term
    return reduce_u32_mod_q(acc, q)


def _firstdim_multiply_kconcat(params: Params, db_chans, q_arr,
                               q_transposed: bool):
    """Dense scan over the THROUGHPUT dense layout: per CRT channel one
    int8 array (z, inst, trials, num_per, NUM_LIMBS*dim0) — the
    limb-CONCATENATED row layout (limb k of column j at minor position
    k*dim0+j). Reshaping to (Z, M, L*dim0) merges only the NON-minor
    (inst, trials, num_per) axes, which is free under TPU tiling; the
    sharded path's 6-D local shards (..., NUM_LIMBS, dim0) also reshape
    here, merging the MINOR pair — that copy is shard-local and small,
    but at the full 8.6 GB single-device index it materialized a 4 GB
    HLO temp and OOM'd HBM, which is why the single-device storage is
    pre-merged (server_jax.db_tensor_to_device). The whole scan is
    ONE GEMM per channel against a weight-grouped query operand: weight-s
    columns of limb-block k carry query limb s-k (zero outside range), so
    the GEMM's K-reduction itself sums every k+l=s pair and the int32
    output is W*R = (2L-1)*R columns instead of the L*R-per-limb-GEMM
    (4x L*R total) of the latency layout — at R=32 that un-fuseable int32
    output traffic dominates and this form wins 49.4 -> 30.3 ms on the
    8.6 GB index (tools/profile_scan_r32.py, v5e). At R=2 it LOSES
    13.5 -> 14.8 ms, which is why the latency layout remains the default
    (see firstdim_multiply). int32 exact: <= L*dim0 products of 127*127
    (127*127*2048 < 2^31).

    q_arr: (crt, z, dim0, R) u32, or (crt, z, R, dim0) when q_transposed
    (both orientations measure equal: 14.81/14.86 ms at R=2, 30.3/31.65 at
    R=32 incl. the transposed path's one-time query transpose)."""
    if db_chans[0].ndim == 6:
        Z, inst, trials, npr, L, dim0 = db_chans[0].shape
    else:
        Z, inst, trials, npr, ld = db_chans[0].shape
        L, dim0 = NUM_LIMBS, ld // NUM_LIMBS
    M = inst * trials * npr
    R = q_arr.shape[-2] if q_transposed else q_arr.shape[-1]
    W = 2 * NUM_LIMBS - 1
    out_ch = []
    for c, q in enumerate(params.moduli):
        qc = q_arr[c]
        if q_transposed:
            q_limbs = _to_limbs_i8(qc)              # L x (z, R, dim0)
            zero = jnp.zeros_like(q_limbs[0])
            rows = [jnp.concatenate(
                [q_limbs[s - k] if 0 <= s - k < NUM_LIMBS else zero
                 for k in range(NUM_LIMBS)], axis=-1) for s in range(W)]
            qq = jnp.concatenate(rows, axis=-2)     # (z, W*R, L*dim0)
            zs = jnp.einsum("zij,zrj->zir",
                            db_chans[c].reshape(Z, M, L * dim0), qq,
                            preferred_element_type=jnp.int32)
        else:
            q_limbs = _to_limbs_i8(qc)              # L x (z, dim0, R)
            zero = jnp.zeros_like(q_limbs[0])
            blocks = [jnp.concatenate(
                [q_limbs[s - k] if 0 <= s - k < NUM_LIMBS else zero
                 for s in range(W)], axis=-1) for k in range(NUM_LIMBS)]
            qq = jnp.concatenate(blocks, axis=-2)   # (z, L*dim0, W*R)
            zs = jnp.einsum("zij,zjr->zir",
                            db_chans[c].reshape(Z, M, L * dim0), qq,
                            preferred_element_type=jnp.int32)
        acc = _combine_weight_groups(zs, R, q)
        out_ch.append(acc.reshape(Z, inst, trials, npr, R))
    return jnp.stack(out_ch, axis=0)


def firstdim_multiply(params: Params, db_planes, q_arr):
    """Encrypted-query x DB matvec (reference compute/dot_product.rs).

    db_planes: tuple of crt_count*NUM_LIMBS arrays, each
               (z, inst, trials, num_per, dim0) int8 — plane index
               c*NUM_LIMBS + k holds limb k of CRT channel c. The DB is
               stored PRE-DECOMPOSED into 7-bit limbs (same total bytes as
               u32) and as SEPARATE plane arrays: slicing planes out of one
               stacked tensor made XLA pick a layout that re-copied the
               plane per scan (2.3x slower per byte measured on v5e); as
               standalone parameters each plane streams at ~500 GB/s.
    q_arr:     (crt, z, dim0, R) uint32 (R = 2 rows x batched queries)
    Returns (crt, z, inst, trials, num_per, R) uint32, exact mod q_c.

    Query limbs stack into the matmul N dimension (N = NUM_LIMBS*R) and the
    inst/trials axes fold into the GEMM M axis (a free reshape — they are
    adjacent to num_per in the plane layout), so the batch is Z and
    M = inst*trials*num_per with no per-trial query repeat. Raced against
    the (z*inst*trials)-batched tiny-GEMM form on v5e (tools/
    profile_scan_forms.py): M-merged wins 466->623 GB/s at inst=4 single
    query and 2.4x at the 16-query batch, ties at inst=1 — the tiny-M
    batched form fragments XLA's tiling. Limb partials regroup by weight
    s=k+l (int32 sums < 2^27) and recombine with Shoup multiplications by
    (2^(7s) mod q), sum < 14q < 2^32.

    A CompactDb db dispatches to the O(populated) compact scan; per-crt
    channel arrays (tuple length crt_count: 5-D flat single-device or 6-D
    sharded-local) dispatch to the THROUGHPUT (limb-concat) dense layout
    (_firstdim_multiply_kconcat — 1.6x faster at the 16-query batch,
    ~10% slower single-query; SpiralServerJax dense_layout picks one).
    """
    if isinstance(db_planes, CompactDb):
        return _firstdim_multiply_compact(params, db_planes, q_arr)
    if db_planes[0].ndim == 6 or len(db_planes) == params.crt_count:
        return _firstdim_multiply_kconcat(params, db_planes, q_arr,
                                          q_transposed=False)
    Z, inst, trials, npr, dim0 = db_planes[0].shape
    R = q_arr.shape[-1]
    IT = inst * trials
    out_ch = []
    for c, q in enumerate(params.moduli):
        q_limbs = _to_limbs_i8(q_arr[c])                 # each (z, j, r) int8
        q_stack = jnp.concatenate(q_limbs, axis=-1)      # (z, j, L*R)
        parts = [jnp.einsum("zij,zjr->zir",
                            db_planes[c * NUM_LIMBS + k].reshape(
                                Z, IT * npr, dim0), q_stack,
                            preferred_element_type=jnp.int32)
                 for k in range(NUM_LIMBS)]
        acc = _combine_scan_parts(parts, R, q)
        out_ch.append(acc.reshape(Z, inst, trials, npr, R))
    return jnp.stack(out_ch, axis=0)


def _combine_scan_parts(parts, R: int, q: int):
    """Regroup the NUM_LIMBS x NUM_LIMBS limb partials of the scan GEMM by
    weight s=k+l (int32 sums < 2^27) and recombine mod q with Shoup
    multiplications by (2^(7s) mod q); the lazy sum stays < 14q < 2^32."""
    partials = [None] * (2 * NUM_LIMBS - 1)
    for k in range(NUM_LIMBS):
        for l in range(NUM_LIMBS):
            m = parts[k][..., l * R : (l + 1) * R]
            s = k + l
            partials[s] = m if partials[s] is None else partials[s] + m
    acc = None
    for s, p in enumerate(partials):
        term = shoup_mulmod_lazy(p.astype(U32), (1 << (LIMB_BITS * s)) % q, q)
        acc = term if acc is None else acc + term   # < 14q < 2^32
    return reduce_u32_mod_q(acc, q)


def firstdim_multiply_qT(params: Params, db_planes, q_t):
    """firstdim_multiply with the query in row-transposed layout
    q_t: (crt, z, R, dim0) uint32 — the carrier the batched serving path
    assembles with NO lane padding. Any u32/int8 array with a small minor
    dim pads under the TPU's T(8,128) tiling: the (..., dim0, R) layout
    with R=2 pads its minor dim 64x, and at a 16-query batch on the 1 GiB
    config the vmapped expansion scatter materialized 16 GB of padding
    and OOM'd the chip. With dim0 minor every intermediate is pad-free.
    Bit-identical to firstdim_multiply on the transposed query (the int32
    partial sums are exact in any order); column order [l*R + r] matches,
    so the limb recombination is shared."""
    if isinstance(db_planes, CompactDb):
        return _firstdim_multiply_compact(params, db_planes, q_t,
                                          q_transposed=True)
    if db_planes[0].ndim == 6 or len(db_planes) == params.crt_count:
        return _firstdim_multiply_kconcat(params, db_planes, q_t,
                                          q_transposed=True)
    Z, inst, trials, npr, dim0 = db_planes[0].shape
    R = q_t.shape[-2]
    IT = inst * trials
    out_ch = []
    for c, q in enumerate(params.moduli):
        q_limbs = _to_limbs_i8(q_t[c])                   # each (z, r, j) int8
        q_stack = jnp.concatenate(q_limbs, axis=-2)      # (z, L*R, j)
        parts = [jnp.einsum("zij,zrj->zir",
                            db_planes[c * NUM_LIMBS + k].reshape(
                                Z, IT * npr, dim0), q_stack,
                            preferred_element_type=jnp.int32)
                 for k in range(NUM_LIMBS)]
        acc = _combine_scan_parts(parts, R, q)
        out_ch.append(acc.reshape(Z, inst, trials, npr, R))
    return jnp.stack(out_ch, axis=0)


# ---------------------------------------------------------------------------
# coefficient expansion (reference server.rs:19-121)
# ---------------------------------------------------------------------------

class ExpansionPlan:
    """Host-side static data for one Params: automorphism tables per round,
    NTT'd -x^(2048-2^r) scalars, skip masks."""

    def __init__(self, params: Params):
        from .. import poly as hpoly

        self.params = params
        self.neg1 = []
        for p in params.get_v_neg1_raw():
            ntt = hpoly.to_ntt(params, p.reshape(1, 1, -1))
            self.neg1.append(ntt[0, 0].astype(np.uint32))  # (crt, n)
        self.auto = [automorph_tables(params, (params.poly_len >> r) + 1)
                     for r in range(params.poly_len_log2)]


def _expansion_round_update(params: Params, cts, w, t_tables, mask):
    """One expansion butterfly applied to a batch of cts.

    cts: (B, 2, 1, crt, n); w: (2, t_exp, crt, n); mask: static bool (B,) —
    False entries keep their pre-update value.
    """
    perm, neg = t_tables
    hi, lo = from_ntt(params, cts)                     # (B, 2, 1, n) pairs
    a_hi, a_lo = automorph_pair(params, hi, lo, perm, neg)
    t_exp = (w[0] if isinstance(w, tuple) else w).shape[1]
    ginv = gadget_digits(params, a_hi[:, 0:1], a_lo[:, 0:1], t_exp, 1)
    ginv_ntt = to_ntt_no_reduce(params, ginv)          # (B, t_exp, 1, crt, n)
    w_g = matmul_mod(params, w, ginv_ntt)              # (B, 2, 1, crt, n)
    auto1 = to_ntt(params, a_hi[:, 1:2], a_lo[:, 1:2])  # (B, 1, 1, crt, n)
    res = add_mod(params, cts, w_g)
    row1 = add_mod(params, res[:, 1:2], auto1)
    res = jnp.concatenate([res[:, 0:1], row1], axis=1)
    if mask.all():
        return res
    m = jnp.asarray(mask).reshape((-1,) + (1,) * (cts.ndim - 1))
    return jnp.where(m, res, cts)


def coefficient_expansion(params: Params, plan: ExpansionPlan, ct0,
                          v_w_left, v_w_right, max_bits_to_gen_right: int):
    """ct0: (2, 1, crt, n). Returns (2^g, 2, 1, crt, n)."""
    g = params.g()
    stop_round = params.stop_round() if params.db_dim_2 > 0 else 0
    cts = ct0[None]
    for r in range(g):
        num_in = cts.shape[0]
        t_tables = plan.auto[r]
        new = scalar_mulmod(params, jnp.asarray(plan.neg1[r]), cts)
        cts = jnp.concatenate([cts, new], axis=0)       # (2*num_in, ...)
        num = 2 * num_in

        # static skip masks (reference server.rs:33-44)
        mask = np.ones(num, dtype=bool)
        for i in range(num):
            if stop_round > 0 and r > stop_round and (i % 2) == 1:
                mask[i] = False
            if (stop_round > 0 and r == stop_round and (i % 2) == 1
                    and (i // 2) >= max_bits_to_gen_right):
                mask[i] = False

        if r == 0:
            # both children use the right key (i%2==0 requires r != 0)
            cts = _expansion_round_update(params, cts, v_w_right[0],
                                          t_tables, mask)
        else:
            evens = _expansion_round_update(params, cts[0::2], v_w_left[r],
                                            t_tables, mask[0::2])
            if mask[1::2].any():
                odds = _expansion_round_update(params, cts[1::2], v_w_right[r],
                                               t_tables, mask[1::2])
            else:
                odds = cts[1::2]
            cts = jnp.stack([evens, odds], axis=1).reshape(cts.shape)
    return cts


def _next_pow2(x: int, lo: int = 4) -> int:
    n = lo
    while n < x:
        n *= 2
    return n


class SparseExpansionPlan:
    """Compacted expansion schedule for a populated-index set.

    The reference only expands ciphertexts whose first-dim DB indices are
    populated (per-round skip sets, query_expansion.rs:213-248
    to_per_round_set). A dense TPU batch can't skip FLOPs with masks, so the
    schedule is rebuilt as gathers over a *compacted* live set: round r
    processes only the ancestors of needed leaves, giving O(g * populated)
    work instead of O(2^g). Needed leaves are {2i : i populated} on the
    Regev side plus the first t_gsw*db_dim_2 odd (GSW) leaves.

    All capacities are quantized to powers of two so the jitted program only
    recompiles when the population crosses a capacity bucket; the index
    arrays themselves are traced arguments, not baked-in constants.
    """

    def __init__(self, params: Params, populated_dim0,
                 max_bits_to_gen_right: int):
        g = params.g()
        stop_round = params.stop_round() if params.db_dim_2 > 0 else 0
        dim0 = 1 << params.db_dim_1
        pop = sorted({int(i) for i in populated_dim0})
        assert pop and pop[-1] < dim0
        self.params = params
        self.populated = pop

        # needed[r] = entries (indices in [0, 2^(r+1))) whose value after
        # round r feeds a used leaf (to_per_round_set propagation). With
        # further dims the Regev leaves sit at even indices; without, they
        # are contiguous (reference query_expansion.rs:322-342).
        stride = 2 if params.db_dim_2 > 0 else 1
        needed = [set() for _ in range(g)]
        for i in pop:
            needed[g - 1].add(stride * i)
        if params.db_dim_2 > 0:
            for i in range(max_bits_to_gen_right):
                needed[g - 1].add(2 * i + 1)
        for r in range(g - 2, -1, -1):
            sz = 1 << (r + 1)
            for e in range(sz):
                if e in needed[r + 1] or (e + sz) in needed[r + 1]:
                    needed[r].add(e)

        def update_ok(r: int, e: int) -> bool:
            if stop_round > 0 and r > stop_round and (e % 2) == 1:
                return False
            if (stop_round > 0 and r == stop_round and (e % 2) == 1
                    and (e // 2) >= max_bits_to_gen_right):
                return False
            return True

        self.rounds = []
        live_prev = [0]
        for r in range(g):
            live = sorted(needed[r])
            pos_prev = {e: k for k, e in enumerate(live_prev)}
            cap = _next_pow2(len(live))
            parent_pos = np.zeros(cap, dtype=np.int32)
            neg_mask = np.zeros(cap, dtype=bool)
            for k, e in enumerate(live):
                parent_pos[k] = pos_prev[e % (1 << r)]
                neg_mask[k] = e >= (1 << r)
            # parity groups among entries to update (left key iff r>0 and
            # even, reference query_expansion.rs:85-99; r==0 all right)
            ev = [k for k, e in enumerate(live) if update_ok(r, e)
                  and r > 0 and e % 2 == 0]
            od = [k for k, e in enumerate(live) if update_ok(r, e)
                  and not (r > 0 and e % 2 == 0)]
            cap_e = _next_pow2(len(ev), lo=1) if ev else 0
            cap_o = _next_pow2(len(od), lo=1) if od else 0
            # exact-capacity arrays: a 0-cap group must have shape (0,) so
            # jit retraces when a group appears/disappears
            even_sel = np.zeros(cap_e, dtype=np.int32)
            odd_sel = np.zeros(cap_o, dtype=np.int32)
            even_sel[: len(ev)] = ev
            odd_sel[: len(od)] = od
            # combine: src_sel into concat([E(cap_e), O(cap_o), base(cap)])
            src_sel = np.zeros(cap, dtype=np.int32)
            for k in range(cap):
                src_sel[k] = cap_e + cap_o + k     # default: carried base
            for j, k in enumerate(ev):
                src_sel[k] = j
            for j, k in enumerate(od):
                src_sel[k] = cap_e + j
            self.rounds.append(dict(
                parent_pos=parent_pos, neg_mask=neg_mask,
                even_sel=even_sel, odd_sel=odd_sel,
                cap_e=cap_e, cap_o=cap_o, src_sel=src_sel))
            live_prev = live

        # output stage: leaf positions within the final compact array
        leaf_pos = {e: k for k, e in enumerate(live_prev)}
        self.even_leaf_pos = np.array([leaf_pos[stride * i] for i in pop],
                                      dtype=np.int32)
        self.even_dim0_idx = np.array(pop, dtype=np.int32)
        cap_p = _next_pow2(len(pop))
        pad = cap_p - len(pop)
        if pad:
            self.even_leaf_pos = np.concatenate(
                [self.even_leaf_pos, np.zeros(pad, dtype=np.int32)])
            # out-of-bounds scatter indices are dropped (mode="drop")
            self.even_dim0_idx = np.concatenate(
                [self.even_dim0_idx,
                 np.full(pad, dim0, dtype=np.int32)])
        self.odd_leaf_pos = np.array(
            [leaf_pos[2 * i + 1] for i in range(max_bits_to_gen_right)]
            if params.db_dim_2 > 0 else [], dtype=np.int32)

    def signature(self):
        """Static shape signature — recompile only when this changes."""
        return tuple((r["parent_pos"].shape[0], r["cap_e"], r["cap_o"])
                     for r in self.rounds) + (self.even_leaf_pos.shape[0],)

    def device_args(self):
        """Flat tuple of index arrays to pass through jit as traced args."""
        out = []
        for r in self.rounds:
            out.append(jnp.asarray(r["parent_pos"]))
            out.append(jnp.asarray(r["neg_mask"]))
            out.append(jnp.asarray(r["even_sel"]))
            out.append(jnp.asarray(r["odd_sel"]))
            out.append(jnp.asarray(r["src_sel"]))
        out.append(jnp.asarray(self.even_leaf_pos))
        out.append(jnp.asarray(self.even_dim0_idx))
        out.append(jnp.asarray(self.odd_leaf_pos))
        return tuple(out)


def coefficient_expansion_sparse(params: Params, plan: ExpansionPlan,
                                 splan: SparseExpansionPlan, ct0,
                                 v_w_left, v_w_right, sched_args):
    """Compacted expansion. ct0: (2, 1, crt, n). Returns
    (leaves, even_leaf_pos, even_dim0_idx, odd_leaf_pos) where leaves is the
    final compact array (cap, 2, 1, crt, n)."""
    g = params.g()
    args = list(sched_args)
    cts = ct0[None]
    for r in range(g):
        parent_pos, neg_mask, even_sel, odd_sel, src_sel = args[5 * r: 5 * r + 5]
        rd = splan.rounds[r]
        t_tables = plan.auto[r]
        base = jnp.take(cts, parent_pos, axis=0)
        neg = scalar_mulmod(params, jnp.asarray(plan.neg1[r]), base)
        m = neg_mask.reshape((-1,) + (1,) * (base.ndim - 1))
        base = jnp.where(m, neg, base)
        pieces = []
        if rd["cap_e"]:
            ev = _expansion_round_update(
                params, jnp.take(base, even_sel, axis=0), v_w_left[r],
                t_tables, np.ones(rd["cap_e"], dtype=bool))
            pieces.append(ev)
        if rd["cap_o"]:
            od = _expansion_round_update(
                params, jnp.take(base, odd_sel, axis=0), v_w_right[r],
                t_tables, np.ones(rd["cap_o"], dtype=bool))
            pieces.append(od)
        pieces.append(base)
        cts = jnp.take(jnp.concatenate(pieces, axis=0), src_sel, axis=0)
    even_leaf_pos, even_dim0_idx, odd_leaf_pos = args[5 * g: 5 * g + 3]
    return cts, even_leaf_pos, even_dim0_idx, odd_leaf_pos


def regev_to_gsw(params: Params, v_inp, v_conv):
    """v_inp: (num_gsw * t_gsw, 2, 1, crt, n) NTT Regev cts;
    v_conv: (2, 2*t_conv, crt, n). Returns (num_gsw, 2, 2*t_gsw, crt, n)."""
    num_gsw = params.db_dim_2
    t_gsw = params.t_gsw
    hi, lo = from_ntt(params, v_inp)                    # (N, 2, 1, n)
    ginv = gadget_digits(params, hi, lo, 2 * params.t_conv, 2)
    ginv_ntt = to_ntt(params, *_pair_id(ginv, params))  # reduce digits mod q
    conv = matmul_mod(params, v_conv, ginv_ntt)         # (N, 2, 1, crt, n)
    # interleave columns: ct[:, 2j] = conv_j, ct[:, 2j+1] = v_inp_j
    both = jnp.stack([conv, v_inp], axis=1)             # (N, kind, 2, 1, crt, n)
    both = both.reshape(num_gsw, t_gsw * 2, 2, params.crt_count,
                        params.poly_len)                # (g, col, row, crt, n)
    return jnp.swapaxes(both, 1, 2)                     # (g, 2, 2*t_gsw, crt, n)


def _pair_id(digits, params: Params):
    """Digits are plain u32 values (< 2^32) viewed as u64 pairs (0, digits)."""
    return jnp.zeros_like(digits), digits


# ---------------------------------------------------------------------------
# fold + pack (reference server.rs:388-468, compute/{fold,pack}.rs)
# ---------------------------------------------------------------------------

def get_v_folding_neg(params: Params, v_folding, gadget_ntt_u32):
    """v_folding: (db_dim_2, 2, 2*t_gsw, crt, n). gadget_ntt_u32: same-shaped
    constant (host precomputed NTT of the gadget matrix)."""
    hi, lo = from_ntt(params, v_folding)
    ihi, ilo = invert_raw_pair(params, hi, lo)
    inv_ntt = to_ntt(params, ihi, ilo)
    return add_mod(params, jnp.asarray(gadget_ntt_u32)[None], inv_ntt)


def fold_ciphertexts(params: Params, cts_hi, cts_lo, v_folding, v_folding_neg):
    """cts: (..., num_per, 2, 1, n) raw pairs (optional leading batch dims —
    trials fold jointly so the NTT chunker sees the full batch); GSW-driven
    binary fold, returns (..., 2, 1, n) raw pairs.

    v_folding may carry leading PER-QUERY batch dims of its own (ndim > 5,
    e.g. (NQ, dim2, 2, ell, crt, n) against cts (NQ, IT, num_per, 2, 1, n)):
    the batched serving path folds all NQ queries' cts in ONE program —
    one digit NTT, one matmul, one iNTT per round for the whole batch —
    instead of NQ serialized per-query subprograms. Steady-state ties the
    loop at NQ=16 on v5e (the fold is VPU-bound, linear in NQ) but traces/
    compiles 20x faster (38 s vs 750 s, tools/profile_fold.py --batch).
    The per-query key dims align with cts' FIRST leading dims; results are
    bit-exact vs per-query folds (every op is exact mod q, per-query
    operation order unchanged).

    Implements the reference's sparse-DB all-zero shortcut (lib/server
    fold.rs:37-44, "crucial for correctness") as vectorized masks: a round's
    output slot takes b verbatim when a is exactly zero (absent row) and a
    when b is zero, bypassing the GSW selection. Without this, the unsigned
    G^-1 digits' z/2 mean turns the GSW key error into a low-frequency
    cumulative-sum term far over the decode budget whenever one side is a
    true zero. The masks cost two small reductions; the GSW products still
    run dense (no dynamic shapes under jit)."""
    further_dims = params.db_dim_2
    num_per = cts_hi.shape[-4]
    vb = v_folding.ndim - 5                 # leading per-query batch dims
    if num_per == 1:
        return cts_hi[..., 0, :, :, :], cts_lo[..., 0, :, :, :]
    ell = 2 * params.t_gsw
    for cur_dim in range(further_dims):
        num_per //= 2
        a_hi = cts_hi[..., :num_per, :, :, :]
        a_lo = cts_lo[..., :num_per, :, :, :]
        b_hi = cts_hi[..., num_per : 2 * num_per, :, :, :]
        b_lo = cts_lo[..., num_per : 2 * num_per, :, :, :]
        za = jnp.all((a_hi == 0) & (a_lo == 0), axis=(-3, -2, -1))
        zb = jnp.all((b_hi == 0) & (b_lo == 0), axis=(-3, -2, -1))
        # Fused per-round compute: V_neg@G(a) + V_fold@G(b) is ONE matmul
        # [V_neg | V_fold] @ [G(a); G(b)] with doubled contraction dim, and
        # both halves' digit NTTs run as one batched call. Digits are
        # < 2^bits_per < 4q, within the forward NTT's lazy input range, so
        # the mod-q pre-reduction of to_ntt is skipped (outputs stay
        # canonical — bit-exact vs the host oracle either way).
        ginv_a = gadget_digits(params, a_hi, a_lo, ell, 2)
        ginv_b = gadget_digits(params, b_hi, b_lo, ell, 2)
        g_ntt = to_ntt_no_reduce(
            params, jnp.concatenate([ginv_a, ginv_b], axis=-3))
        key = further_dims - 1 - cur_dim
        sel = (slice(None),) * vb + (key,)
        v_cat = jnp.concatenate(
            [v_folding_neg[sel], v_folding[sel]], axis=vb + 1)
        f_hi, f_lo = from_ntt(params, matmul_mod(params, v_cat, g_ntt))
        za = za[..., None, None, None]
        zb = zb[..., None, None, None]
        cts_hi = jnp.where(za, b_hi, jnp.where(zb, a_hi, f_hi))
        cts_lo = jnp.where(za, b_lo, jnp.where(zb, a_lo, f_lo))
    return cts_hi[..., 0, :, :, :], cts_lo[..., 0, :, :, :]


def pack(params: Params, v_ct_hi, v_ct_lo, v_packing):
    """v_ct: (n*n, 2, 1, poly_len) raw pairs; v_packing: list of n NTT
    (n+1, t_conv) key matrices (version 0) or [w_key, w_shift] (version 1,
    pack.rs:46-100). Returns packed NTT (n+1, n, crt, poly_len)."""
    n = params.n
    cols = []
    for c in range(n):
        v_int = jnp.zeros((n + 1, 1, params.crt_count, params.poly_len),
                          dtype=U32)
        for r in range(n):
            idx = r * n + c
            ct1_hi, ct1_lo = v_ct_hi[idx, 0:1], v_ct_lo[idx, 0:1]
            ct2 = to_ntt(params, v_ct_hi[idx, 1:2], v_ct_lo[idx, 1:2])
            ginv = gadget_digits(params, ct1_hi, ct1_lo, params.t_conv, 1)
            ginv_ntt = to_ntt(params, *_pair_id(ginv, params))
            if params.version == 0:
                prod = matmul_mod(params, v_packing[r], ginv_ntt)
                row = add_mod(params, v_int[1 + r : 2 + r], ct2)
                v_int = jnp.concatenate(
                    [v_int[: 1 + r], row, v_int[2 + r :]], axis=0)
                v_int = add_mod(params, v_int, prod)
            else:
                w_key, w_shift = v_packing[0], v_packing[1]
                prod = matmul_mod(params, w_key, ginv_ntt)   # (n+1, 1, crt, z)
                row1 = add_mod(params, prod[1:2], ct2)
                prod = jnp.concatenate([prod[0:1], row1, prod[2:]], axis=0)
                for _ in range(r):
                    p1_hi, p1_lo = from_ntt(params, prod[0:1])
                    ginv2 = gadget_digits(params, p1_hi, p1_lo, params.t_conv, 1)
                    ginv2_ntt = to_ntt(params, *_pair_id(ginv2, params))
                    part1 = matmul_mod(params, w_shift, ginv2_ntt)
                    rest = prod[1:]
                    rolled = jnp.concatenate([rest[-1:], rest[:-1]], axis=0)
                    part2 = jnp.concatenate(
                        [jnp.zeros_like(prod[0:1]), rolled], axis=0)
                    prod = add_mod(params, part1, part2)
                v_int = add_mod(params, v_int, prod)
        cols.append(v_int)
    return jnp.concatenate(cols, axis=1)

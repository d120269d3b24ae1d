"""Pallas TPU kernel for the Spiral first-dimension multiply.

The XLA limb-matmul path (spiral_jax.firstdim_multiply) materializes four
int8 limb copies of the DB in HBM; for small query batches the scan is
HBM-bound, so a fused kernel that reads the uint32 DB exactly once and does
the modmul arithmetic in VMEM is the speed-of-light formulation.

Arithmetic: per (z, i, r), sum over j of db[z,i,j] * q[z,j,r] mod q_c.
Products are 56-bit, carried as (hi, lo) uint32 pairs; both halves split
into 16-bit sub-lanes before the lane reduction so every partial sum stays
exact in int32 (dim0 <= 2^15), then the four partials recombine mod q_c
with Shoup multiplications by 2^16k mod q_c.

Kernel layouts (lane axis = dim0, the big contiguous read):
  db  : (num_per, poly_len, dim0)   block (num_per, Z_BLOCK, dim0)
  q   : (R, poly_len, dim0)         block (R, Z_BLOCK, dim0)
  out : (num_per, poly_len, R)      block (num_per, Z_BLOCK, R)

Reference semantics: lib/server/src/compute/dot_product.rs:14-220.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import Params
from .modops import U32, cond_sub, cond_sub_q, mul32_parts, reduce_u32_mod_q, shoup_mulmod_lazy

Z_BLOCK = 8


def _combine_mod_q(s_ll, s_lh, s_hl, s_hh, q: int):
    """(s_ll + 2^16 s_lh + 2^32 s_hl + 2^48 s_hh) mod q, all uint32."""
    acc = reduce_u32_mod_q(s_ll, q)
    acc = acc + shoup_mulmod_lazy(s_lh, (1 << 16) % q, q)
    acc = acc + shoup_mulmod_lazy(s_hl, (1 << 32) % q, q)
    acc = acc + shoup_mulmod_lazy(s_hh, (1 << 48) % q, q)
    acc = cond_sub(acc, 4 * q)
    acc = cond_sub(acc, 2 * q)
    return cond_sub_q(acc, q)


def _scan_kernel(db_ref, q_ref, out_ref, *, q: int, num_per: int, r_cols: int):
    m16 = U32(0xFFFF)

    def body(i, _):
        a = db_ref[i]                              # (Z_BLOCK, dim0)
        for r in range(r_cols):
            b = q_ref[r]                           # (Z_BLOCK, dim0)
            hi, lo = mul32_parts(a, b)
            # Mosaic lacks unsigned reductions; 16-bit halves summed over
            # dim0 <= 2^15 stay < 2^31, so int32 sums are exact.
            def _s(x):
                return jnp.sum(x.astype(jnp.int32), axis=-1,
                               dtype=jnp.int32).astype(U32)
            s_ll = _s(lo & m16)
            s_lh = _s(lo >> U32(16))
            s_hl = _s(hi & m16)
            s_hh = _s(hi >> U32(16))
            out_ref[i, pl.ds(0, Z_BLOCK), r] = _combine_mod_q(
                s_ll, s_lh, s_hl, s_hh, q)
        return 0

    jax.lax.fori_loop(0, num_per, body, 0)


def firstdim_scan_pallas(params: Params, db, q_arr, interpret: bool | None = None):
    """db: (crt, poly_len, num_per, dim0) u32 (one instance/trial);
    q_arr: (crt, poly_len, dim0, R) u32. -> (crt, poly_len, num_per, R).

    (Transposes to the kernel layouts at trace time; use
    firstdim_scan_pallas_pretransposed with DB stored kernel-native to avoid
    the per-call transpose.)
    """
    db_t = jnp.transpose(db, (0, 2, 1, 3))        # (crt, num_per, z, dim0)
    q_t = jnp.transpose(q_arr, (0, 3, 1, 2))      # (crt, R, z, dim0)
    out = firstdim_scan_pallas_pretransposed(params, db_t, q_t, interpret)
    return jnp.transpose(out, (0, 2, 1, 3))       # (crt, z, num_per, R)


def firstdim_scan_pallas_pretransposed(params: Params, db_t, q_t,
                                       interpret: bool | None = None):
    """db_t: (crt, num_per, poly_len, dim0); q_t: (crt, R, poly_len, dim0).
    -> (crt, num_per, poly_len, R)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    crt, num_per, z, dim0 = db_t.shape
    r_cols = q_t.shape[1]
    assert z % Z_BLOCK == 0
    outs = []
    for c, q in enumerate(params.moduli):
        kernel = functools.partial(_scan_kernel, q=q, num_per=num_per,
                                   r_cols=r_cols)
        out = pl.pallas_call(
            kernel,
            grid=(z // Z_BLOCK,),
            in_specs=[
                pl.BlockSpec((num_per, Z_BLOCK, dim0), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r_cols, Z_BLOCK, dim0), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((num_per, Z_BLOCK, r_cols),
                                   lambda g: (0, g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_per, z, r_cols), jnp.uint32),
            interpret=interpret,
        )(db_t[c], q_t[c])
        outs.append(out)
    return jnp.stack(outs, axis=0)

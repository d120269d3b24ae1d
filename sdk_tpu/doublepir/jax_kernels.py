"""TPU kernels for DoublePIR's wrapping-u32 matmuls.

Everything in DoublePIR is arithmetic mod 2^32, which uint32 lanes give for
free; the MXU is engaged by decomposing operands into 7-bit int8 limbs
(max 127, signed-safe) and accumulating limb products in int32. Partial
sums of <= 2^16 limb products stay below 2^31, so the reduction dimension
is chunked at 65536; chunk partials re-accumulate in uint32, where wrapping
IS the mod-2^32 reduction.

Reference semantics: lib/doublepir/src/matrix/kernels.rs (packed matvec)
and the setup/answer matmuls in doublepir.rs:76-350.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .matrix import SQUISH_BASIS, SQUISH_DELTA

U32 = jnp.uint32

LIMB_BITS = 7
K_CHUNK = 1 << 16


def _limbs_i8(x, num_limbs: int):
    return [((x >> U32(LIMB_BITS * k)) & U32(127)).astype(jnp.int8)
            for k in range(num_limbs)]


def matmul_u32_traced(a, b, a_bits: int = 32):
    """Wrapping-u32 matmul (a: (M, K), b: (K, N), uint32) via int8 limb
    matmuls on the MXU. Exact mod 2^32. `a_bits` bounds the values of `a`
    (e.g. 10 for unsquished 10-bit fields) so fewer limb products run."""
    M, K = a.shape
    _, N = b.shape
    na = -(-a_bits // LIMB_BITS)
    nb = 5  # ceil(32 / 7)
    out = jnp.zeros((M, N), dtype=U32)
    for s in range(0, K, K_CHUNK):
        e = min(s + K_CHUNK, K)
        a_l = _limbs_i8(a[:, s:e], na)
        b_l = _limbs_i8(b[s:e, :], nb)
        partials = {}
        for k in range(na):
            for l in range(nb):
                sh = LIMB_BITS * (k + l)
                if sh >= 32:
                    continue
                m = jnp.dot(a_l[k], b_l[l], preferred_element_type=jnp.int32)
                partials[sh] = m if sh not in partials else partials[sh] + m
        for sh, p in partials.items():
            out = out + (p.astype(U32) << U32(sh))
    return out


@functools.lru_cache(maxsize=None)
def _matmul_u32_jit():
    return jax.jit(matmul_u32_traced)


def matmul_u32_device(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Host-callable device matmul; drop-in for matrix.matmul_u32."""
    f = _matmul_u32_jit()
    return np.asarray(f(jnp.asarray(a), jnp.asarray(b)))


def unsquish_traced(m, orig_cols: int, basis: int = SQUISH_BASIS,
                    delta: int = SQUISH_DELTA):
    rows, cols = m.shape
    mask = U32((1 << basis) - 1)
    parts = [(m >> U32(k * basis)) & mask for k in range(delta)]
    out = jnp.stack(parts, axis=-1).reshape(rows, cols * delta)
    return out[:, :orig_cols]


ROW_CHUNK = 4096


def mat_mul_vec_packed_traced(a_packed, b, basis: int = SQUISH_BASIS,
                              delta: int = SQUISH_DELTA):
    """unsquish(a) @ b on device (b: (cols*delta, N) — N can batch queries).

    Rows are processed in chunks so the unsquished copy and limb arrays
    never materialize more than ROW_CHUNK rows in HBM (checklist-scale DBs
    are tens of GB unsquished)."""
    rows, cols = a_packed.shape
    if rows <= ROW_CHUNK:
        un = unsquish_traced(a_packed, cols * delta, basis, delta)
        return matmul_u32_traced(un, b, a_bits=basis)
    n_full = rows // ROW_CHUNK

    def one(chunk):
        un = unsquish_traced(chunk, cols * delta, basis, delta)
        return matmul_u32_traced(un, b, a_bits=basis)

    body = jax.lax.map(one, a_packed[: n_full * ROW_CHUNK]
                       .reshape(n_full, ROW_CHUNK, cols))
    out = body.reshape(n_full * ROW_CHUNK, -1)
    if rows % ROW_CHUNK:
        out = jnp.concatenate([out, one(a_packed[n_full * ROW_CHUNK :])])
    return out


def mat_mul_transposed_packed_traced(a_packed, b, basis: int = SQUISH_BASIS,
                                     delta: int = SQUISH_DELTA):
    """unsquish(a) @ b.T on device (reference kernels.rs:180-278)."""
    rows, cols = a_packed.shape
    un = unsquish_traced(a_packed, cols * delta, basis, delta)
    return matmul_u32_traced(un, jnp.transpose(b), a_bits=basis)


@functools.lru_cache(maxsize=None)
def _jit_mv():
    return jax.jit(mat_mul_vec_packed_traced)


@functools.lru_cache(maxsize=None)
def _jit_mt():
    return jax.jit(mat_mul_transposed_packed_traced)


def device_kernels():
    """Host-callable (mat_mul_vec_packed, mat_mul_transposed_packed) pair —
    drop-in for scheme.answer(kernels=...)."""

    def mv(a, b):
        return np.asarray(_jit_mv()(jnp.asarray(a), jnp.asarray(b)))

    def mt(a, b):
        return np.asarray(_jit_mt()(jnp.asarray(a), jnp.asarray(b)))

    return mv, mt


class DoublePirAnswerJax:
    """Device-resident DoublePIR online answer path.

    Holds the squished DB and the squished H1 hint on device; per answer
    call runs the first-level row-batch matvecs and the second-level
    H1/a1 matvecs as limb matmuls. The glue transform
    (transpose_expand_concat_cols_squish) is host-side numpy for now.
    """

    def __init__(self, db_packed: np.ndarray, h1_packed: np.ndarray):
        self.db = jnp.asarray(db_packed)
        self.h1 = jnp.asarray(h1_packed)
        self._mv = jax.jit(mat_mul_vec_packed_traced)

    def db_rows_times(self, start: int, count: int, q1: np.ndarray) -> np.ndarray:
        out = self._mv(jax.lax.slice_in_dim(self.db, start, start + count),
                       jnp.asarray(q1))
        return np.asarray(out)

    def h1_times(self, q2: np.ndarray) -> np.ndarray:
        return np.asarray(self._mv(self.h1, jnp.asarray(q2)))

"""Four-step NTT on the MXU.

The negacyclic 2048-point NTT factors as 64x32: a 64-point DFT down the
columns (one 64x64 mod-q matmul), a pointwise twiddle, and a 32-point DFT
along the rows (one 32x32 matmul) — with the psi twist folded into the
constant matrices. Mod-q matmuls run as int8 7-bit-limb MXU matmuls with
Shoup recombination (the NTT-as-matmul pattern of the FHE-on-AI-ASIC
literature; see PAPERS.md).

Output ordering matches the butterfly implementation exactly: the reference
NTT emits the natural-order negacyclic spectrum in bit-reversed index order
(verified against a direct DFT), so a static gather finishes the transform.
Drop-in bit-exact replacement for ops.ntt_jax; enable with use_fourstep=True
on the transform helpers or SDK_TPU_NTT=fourstep.

Forward:  H[j] = B[k1, k2] at k = br11(j), k = k2*N1 + k1, where
          B = ((G1 @ X) * T) @ G2,
          G1[a, i1] = psi^(i1*N2) * w^(N2*a*i1),  T[a, i2] = psi^i2 * w^(a*i2),
          G2[i2, b] = w^(N1*i2*b),  X[i1, i2] = x[i1*N2 + i2].
Inverse:  x[i] = (1/N) psi^(-i) * DFT_{w^-1}(Xhat)[i], same structure with
          inverse roots, no input twist, and a pointwise output scale.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..arith import reverse_bits_arr
from ..params import Params, get_minimal_primitive_root
from .modops import U32, cond_sub_q, reduce_u32_mod_q, shoup_mulmod_lazy, shoup_mulmod_var_lazy

N1 = 64
N2 = 32
LIMB_BITS = 7
NUM_LIMBS = 4

_PLAN_CACHE: dict = {}


def _pow_mat(base: int, exps: np.ndarray, q: int) -> np.ndarray:
    flat = np.array([pow(base, int(e), q) for e in exps.reshape(-1)],
                    dtype=np.uint64)
    return flat.reshape(exps.shape)


def _limbs_const(m: np.ndarray) -> np.ndarray:
    """(limb, ...) int8 limbs of a u64 constant matrix (< 2^28)."""
    return np.stack([((m >> np.uint64(LIMB_BITS * k)) & np.uint64(127))
                     .astype(np.int8) for k in range(NUM_LIMBS)])


def _shoup(m: np.ndarray, q: int) -> np.ndarray:
    return ((m.astype(np.uint64) << np.uint64(32)) // np.uint64(q)).astype(np.uint32)


class FourStepPlan:
    """Per-(poly_len, moduli) constants for forward + inverse transforms."""

    def __init__(self, params: Params):
        N = params.poly_len
        assert N == N1 * N2, "four-step plan is specialized to 2048 = 64x32"
        log_n = params.poly_len_log2
        br = reverse_bits_arr(np.arange(N, dtype=np.uint64), log_n).astype(np.int64)
        # forward output gather: H[j] = B.flat[(br(j)%N1)*N2 + br(j)//N1]
        self.fwd_gather = ((br % N1) * N2 + br // N1).astype(np.int32)
        # inverse input gather: Xhat[k] = H[br(k)]
        self.inv_gather = br.astype(np.int32)

        self.chan = []
        for q in params.moduli:
            psi = get_minimal_primitive_root(2 * N, q)
            w = pow(psi, 2, q)
            psi_inv = pow(psi, -1, q)
            w_inv = pow(w, -1, q)
            n_inv = pow(N, -1, q)

            a = np.arange(N1)
            i1 = np.arange(N1)
            i2 = np.arange(N2)
            # forward
            g1 = (_pow_mat(w, (N2 * np.outer(a, i1)) % (N), q)
                  * _pow_mat(psi, np.broadcast_to((i1 * N2) % (2 * N), (N1, N1)), q)) % q
            t = (_pow_mat(w, np.outer(a, i2) % N, q)
                 * _pow_mat(psi, np.broadcast_to(i2, (N1, N2)), q)) % q
            g2 = _pow_mat(w, (N1 * np.outer(i2, np.arange(N2))) % N, q)
            # inverse (cyclic DFT with w_inv; roles: rows of length N2)
            ia = np.arange(N1)
            g1i = _pow_mat(w_inv, (N2 * np.outer(ia, i1)) % N, q)
            ti = _pow_mat(w_inv, np.outer(ia, i2) % N, q)
            g2i = _pow_mat(w_inv, (N1 * np.outer(i2, np.arange(N2))) % N, q)
            # output scale: (1/N) * psi^(-i), natural order
            scale = (_pow_mat(psi_inv, np.arange(N) % (2 * N), q)
                     * np.uint64(n_inv)) % q

            self.chan.append({
                "g1": _limbs_const(g1), "t": t.astype(np.uint32),
                "t_sh": _shoup(t, q), "g2": _limbs_const(g2),
                "g1i": _limbs_const(g1i), "ti": ti.astype(np.uint32),
                "ti_sh": _shoup(ti, q), "g2i": _limbs_const(g2i),
                "scale": scale.astype(np.uint32), "scale_sh": _shoup(scale, q),
            })


def get_plan(params: Params) -> FourStepPlan:
    key = (params.poly_len, params.moduli)
    if key not in _PLAN_CACHE:
        _PLAN_CACHE[key] = FourStepPlan(params)
    return _PLAN_CACHE[key]


def _limbs_rt(x):
    return [((x >> U32(LIMB_BITS * k)) & U32(127)).astype(jnp.int8)
            for k in range(NUM_LIMBS)]


def _final(acc, q: int):
    """<= 7 Shoup-lazy terms (< 14q < 2^32) -> canonical [0, q)."""
    from .modops import cond_sub

    acc = cond_sub(acc, 8 * q)
    acc = cond_sub(acc, 4 * q)
    acc = cond_sub(acc, 2 * q)
    return cond_sub_q(acc, q)


def _matmul_left(g_limbs: np.ndarray, x, q: int):
    """(N1, N1) const @ x (..., N1, M) -> (..., N1, M), exact mod q."""
    x_l = _limbs_rt(x)
    partials = {}
    for k in range(NUM_LIMBS):
        gk = jnp.asarray(g_limbs[k])
        for l in range(NUM_LIMBS):
            m = jnp.einsum("ab,...bc->...ac", gk, x_l[l],
                           preferred_element_type=jnp.int32)
            s = LIMB_BITS * (k + l)
            partials[s] = m if s not in partials else partials[s] + m
    return _final(_sum_shoup(partials, q), q)


def _matmul_right(x, g_limbs: np.ndarray, q: int):
    """x (..., M, N2) @ (N2, N2) const -> (..., M, N2), exact mod q."""
    x_l = _limbs_rt(x)
    partials = {}
    for l in range(NUM_LIMBS):
        gl = jnp.asarray(g_limbs[l])
        for k in range(NUM_LIMBS):
            m = jnp.einsum("...ab,bc->...ac", x_l[k], gl,
                           preferred_element_type=jnp.int32)
            s = LIMB_BITS * (k + l)
            partials[s] = m if s not in partials else partials[s] + m
    return _final(_sum_shoup(partials, q), q)


def _sum_shoup(partials: dict, q: int):
    acc = None
    for sh, p in partials.items():
        t = shoup_mulmod_lazy(p.astype(U32), (1 << sh) % q, q)
        acc = t if acc is None else acc + t
    return acc


def ntt_forward(params: Params, x):
    """x: (..., crt, poly_len) uint32 -> (..., crt, poly_len), identical
    output words to ops.ntt_jax.ntt_forward."""
    plan = get_plan(params)
    N = params.poly_len
    outs = []
    for c, q in enumerate(params.moduli):
        ch = plan.chan[c]
        xv = reduce_u32_mod_q(x[..., c, :], q)      # accept lazy inputs
        X = xv.reshape(xv.shape[:-1] + (N1, N2))
        A = _matmul_left(ch["g1"], X, q)
        A = cond_sub_q(shoup_mulmod_var_lazy(
            A, jnp.asarray(ch["t"]), jnp.asarray(ch["t_sh"]), q), q)
        B = _matmul_right(A, ch["g2"], q)
        Z = B.reshape(xv.shape[:-1] + (N,))
        outs.append(jnp.take(Z, jnp.asarray(plan.fwd_gather), axis=-1))
    return jnp.stack(outs, axis=-2)


def ntt_inverse(params: Params, x):
    """Inverse transform, identical output words to ops.ntt_jax.ntt_inverse."""
    plan = get_plan(params)
    N = params.poly_len
    outs = []
    for c, q in enumerate(params.moduli):
        ch = plan.chan[c]
        xv = reduce_u32_mod_q(x[..., c, :], q)
        xhat = jnp.take(xv, jnp.asarray(plan.inv_gather), axis=-1)
        X = xhat.reshape(xv.shape[:-1] + (N1, N2))
        A = _matmul_left(ch["g1i"], X, q)
        A = cond_sub_q(shoup_mulmod_var_lazy(
            A, jnp.asarray(ch["ti"]), jnp.asarray(ch["ti_sh"]), q), q)
        B = _matmul_right(A, ch["g2i"], q)
        # y[k2*N1 + k1] = B[k1, k2]
        Y = jnp.swapaxes(B, -2, -1).reshape(xv.shape[:-1] + (N,))
        out = cond_sub_q(shoup_mulmod_var_lazy(
            Y, jnp.asarray(ch["scale"]), jnp.asarray(ch["scale_sh"]), q), q)
        outs.append(out)
    return jnp.stack(outs, axis=-2)

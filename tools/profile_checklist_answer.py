"""Stage profile of the fused DoublePIR checklist answer on the real chip.

The fused batched answer (ChecklistServerJax._answer_fused) measures
~260 ms device-side at the production shape, but its ideal HBM traffic is
only ~10 GB (level-1 DB pass 8.6 GB + level-2 operands ~1.9 GB) — ~15 ms at
the ~620 GB/s the Spiral scan achieves on the same chip. This tool times
each stage in isolation with k-loop differencing (k scans chained inside one
dispatch; the ~28 ms tunnel RTT cancels exactly) to localize the gap.

Operands are synthesized ON DEVICE (random, correct dtypes/shapes) — stage
timing is content-independent, and uploading real A1/A2 through the 30 MB/s
tunnel costs minutes without changing any kernel's runtime.

Usage: python tools/profile_checklist_answer.py [--tiny]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sdk_tpu.doublepir.jax_kernels import (mat_mul_vec_packed_traced,
                                           matmul_u32_traced,
                                           unsquish_traced)
from sdk_tpu.doublepir.params import Params
from sdk_tpu.doublepir.server_jax import (ChecklistServerJax, _colsum_u32,
                                          _dot_i8_u32, _dot_i8pair_u32,
                                          _unsquish_limbs)

TINY = "--tiny" in sys.argv
NQ = 8


def make_operands(params: Params):
    l, m, n = params.l, params.m, params.n
    delta = params.delta()
    lp3 = -(-l // 3) * 3

    @jax.jit
    def gen():
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 6)
        db = jax.random.randint(ks[0], (l, m), -128, 128, dtype=jnp.int8)
        h1_sq = jax.random.randint(ks[1], (n * delta, lp3 // 3), 0, 1 << 30,
                                   dtype=jnp.uint32)
        a2p = jax.random.randint(ks[2], (lp3, n), 0, jnp.uint32(0xFFFFFFFF),
                                 dtype=jnp.uint32)
        q1 = jax.random.randint(ks[3], (m, NQ), 0, jnp.uint32(0xFFFFFFFF),
                                dtype=jnp.uint32)
        q2 = jax.random.randint(ks[4], (lp3, NQ), 0, jnp.uint32(0xFFFFFFFF),
                                dtype=jnp.uint32)
        return db, h1_sq, a2p, q1, q2

    ops = gen()
    jax.block_until_ready(ops)
    bs = l // NQ
    bidx = jnp.asarray(np.minimum(np.arange(l) // bs, NQ - 1)
                       .astype(np.int32)[:, None])
    return ops + (bidx,)


def timed_k(fn, args, label, iters=6):
    """fn(args..., i) -> u32 scalar contribution; runs k reps inside one
    dispatch (i perturbs an operand to defeat CSE) and differences k=1 vs
    k=5 so the dispatch RTT cancels."""

    @functools.partial(jax.jit, static_argnums=len(args))
    def run(*a_and_k):
        a, k = a_and_k[:-1], a_and_k[-1]

        def body(i, acc):
            return acc + fn(*a, i.astype(jnp.uint32))

        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    def t(k):
        int(run(*args, k))  # compile + warm
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            int(run(*args, k))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t5 = t(1), t(5)
    ms = (t5 - t1) / 4 * 1e3
    print(f"{label:34s} {ms:9.2f} ms   (k1 {t1*1e3:8.1f}  k5 {t5*1e3:8.1f})",
          flush=True)
    return ms


def main():
    params = Params.from_string("64,6.4,13,17,32,464") if TINY \
        else Params.from_string("1024,6.4,92681,92683,32,464")
    p, delta = params.p, params.delta()
    db, h1_sq, a2p, q1, q2, bidx = make_operands(params)
    db_gb = params.l * params.m / 1e9
    print(f"shape l={params.l} m={params.m} n={params.n} delta={delta} "
          f"db={db_gb:.2f} GB nq={NQ}", flush=True)

    # 1. level-1 DB pass alone
    def level1(db_, q1_, i):
        z = _dot_i8_u32(db_, q1_ + i)
        return z.sum(dtype=jnp.uint32)

    ms1 = timed_k(level1, (db, q1), "level-1 DB GEMM")
    print(f"    -> {db_gb / (ms1 / 1e3):.0f} GB/s DB read", flush=True)

    # 2. level-1 + diag select + squish (the a_1t producer)
    def a1t_stage(db_, q1_, bidx_, i):
        z = _dot_i8_u32(db_, q1_ + i)
        z = z + (jnp.uint32(128) * _colsum_u32(q1_ + i))[None, :]
        a_1 = jnp.take_along_axis(z, bidx_, axis=1)[:, 0]
        pad = (-a_1.shape[0]) % 3
        v = a_1
        rows = []
        for _ in range(delta):
            d = jnp.pad(v % jnp.uint32(p), (0, pad)).reshape(-1, 3)
            v = v // jnp.uint32(p)
            rows.append(sum((d[:, k] << jnp.uint32(10 * k))
                            for k in range(3)))
        return jnp.stack(rows).sum(dtype=jnp.uint32)

    timed_k(a1t_stage, (db, q1, bidx), "level-1 + select + squish")

    # 3. msg0: unsquish(a_1t) @ a2p  (a_1t synthesized: (delta, lp3//3))
    a_1t = h1_sq[:delta]

    def msg0_stage(a1t_, a2p_, i):
        m0 = matmul_u32_traced(unsquish_traced(a1t_ + i, a2p_.shape[0]),
                               a2p_, a_bits=10)
        return m0.sum(dtype=jnp.uint32)

    timed_k(msg0_stage, (a_1t, a2p), "msg0 (4 x l) @ (l x n)")

    # 4. a_2 = packed-matvec(h1_sq, q2) — the level-2 hint pass
    def a2_stage(h1_, q2_, i):
        return mat_mul_vec_packed_traced(h1_, q2_ + i).sum(dtype=jnp.uint32)

    ms4 = timed_k(a2_stage, (h1_sq, q2), "a_2 = packed(h1_sq) @ q2")
    h1_gb = h1_sq.size * 4 / 1e9
    print(f"    -> h1_sq {h1_gb:.2f} GB packed; {h1_gb / (ms4 / 1e3):.0f} "
          f"GB/s packed read", flush=True)

    # 4b. a_2 with pre-extracted int8 digit limb planes (the serving layout)
    h1_lo, h1_hi = jax.jit(_unsquish_limbs)(h1_sq)
    jax.block_until_ready(h1_lo)

    def a2_planes_stage(lo_, hi_, q2_, i):
        return _dot_i8pair_u32(lo_, hi_, q2_ + i).sum(dtype=jnp.uint32)

    ms4b = timed_k(a2_planes_stage, (h1_lo, h1_hi, q2),
                   "a_2 = i8-plane(h1) @ q2")
    pl_gb = (h1_lo.size + h1_hi.size) / 1e9
    print(f"    -> planes {pl_gb:.2f} GB; {pl_gb / (ms4b / 1e3):.0f} GB/s",
          flush=True)

    # 5. h_2 (tiny)
    def h2_stage(a1t_, q2_, i):
        return mat_mul_vec_packed_traced(a1t_ + i, q2_).sum(dtype=jnp.uint32)

    timed_k(h2_stage, (a_1t, q2), "h_2 = packed(a_1t) @ q2")

    # 6. the full fused answer (the production program)
    srv = ChecklistServerJax.__new__(ChecklistServerJax)
    srv.params = params

    def full(db_, lo_, hi_, a2p_, q1_, q2_, bidx_, i):
        m0, a2_, h2_ = ChecklistServerJax._answer_fused(
            srv, db_, lo_, hi_, a2p_, q1_ + i, q2_, bidx_)
        return (m0.sum(dtype=jnp.uint32) + a2_.sum(dtype=jnp.uint32)
                + h2_.sum(dtype=jnp.uint32))

    ms6 = timed_k(full, (db, h1_lo, h1_hi, a2p, q1, q2, bidx),
                  "FULL fused answer")
    agg = db_gb * NQ / (ms6 / 1e3)
    print(f"    -> aggregate {agg:.0f} GB/s (metric basis: db x nq)",
          flush=True)


if __name__ == "__main__":
    main()

"""Race scan GEMM forms at the 16-query batch (R = 2*NQ = 32 columns).

BENCH_r03: batch-16 scan ran at ~33% of the mixed HBM roofline while the
single-query (R=2) form hits 76-83% — this tool hunts the gap on the real
chip. Forms (all bit-exact vs firstdim_multiply where comparable):

  ceiling   one bare int8 einsum per plane, int32 outputs summed to u32 —
            the achievable floor for the current geometry (no epilogue)
  current   firstdim_multiply (4 limb einsums, N=L*R, weight regroup)
  kconcat   ONE GEMM per channel over a limb-interleaved DB layout
            (z, M, L*dim0) with a weight-grouped query operand
            (z, L*dim0, W*R) — the GEMM itself emits weight-grouped sums
            (k+l=s pairs share columns; int32 exact: sums of 4*dim0 terms
            127*127*2048 < 2^31), so no cross-GEMM recombination traffic
  mchunk    current form under lax.map over M-chunks (epilogue forced to
            fuse per chunk; intermediates stay on-chip)

Usage: python tools/profile_scan_r32.py [--inst N] [--r R] [--forms a,b]
       (forms: ceiling,current,mchunk,kconcat,kfused; default all)
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sdk_tpu.ops import spiral_jax as sj
from sdk_tpu.ops.modops import reduce_u32_mod_q, shoup_mulmod_lazy
from sdk_tpu.params import params_from_json

INST = int(sys.argv[sys.argv.index("--inst") + 1]) if "--inst" in sys.argv else 1
R = int(sys.argv[sys.argv.index("--r") + 1]) if "--r" in sys.argv else 32
FORMS = (sys.argv[sys.argv.index("--forms") + 1].split(",")
         if "--forms" in sys.argv else
         ["ceiling", "current", "mchunk", "kconcat", "kfused", "ksplit"])
L = sj.NUM_LIMBS
W = 2 * L - 1


def operands(params):
    trials = params.n * params.n
    dim0, num_per = 1 << params.db_dim_1, 1 << params.db_dim_2

    @jax.jit
    def gen():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        planes, chans = [], []
        for c, q in enumerate(params.moduli):
            u32 = jax.random.randint(
                jax.random.fold_in(k1, c),
                (params.poly_len, params.instances, trials, num_per, dim0),
                0, q, dtype=jnp.uint32)
            for k in range(L):
                planes.append(((u32 >> jnp.uint32(7 * k)) & jnp.uint32(127))
                              .astype(jnp.int8))
            chans.append(jax.random.randint(
                jax.random.fold_in(k2, c), (params.poly_len, dim0, R),
                0, q, dtype=jnp.uint32))
        return tuple(planes), jnp.stack(chans, axis=0)

    db, qa = gen()
    jax.block_until_ready(db)
    nbytes = (params.instances * trials * params.poly_len * num_per
              * dim0 * 8)
    return db, qa, nbytes


def timed(fn, args, iters=6):
    @functools.partial(jax.jit, static_argnums=len(args))
    def run_k(*a):
        args_, k = a[:-1], a[-1]

        def body(i, acc):
            return acc + fn(*args_, i.astype(jnp.uint32))

        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    def t_of(k):
        int(run_k(*args, k))
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            int(run_k(*args, k))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((t_of(5) - t_of(1)) / 4, 1e-9)


def main():
    params = params_from_json(
        '{"n": 2, "nu_1": 9, "nu_2": 6, "p": 256, "q2_bits": 20,'
        ' "t_gsw": 8, "t_conv": 4, "t_exp_left": 8, "t_exp_right": 56,'
        f' "instances": {INST}, "db_item_size": 8192}}')
    db, qa, nbytes = operands(params)
    Z, inst, trials, npr, dim0 = db[0].shape
    M = inst * trials * npr
    print(f"inst={INST} R={R} db={nbytes/1e9:.2f} GB M={M} K={dim0} "
          f"N={L*R}", flush=True)

    # --- ceiling: bare GEMMs, no epilogue ---
    def ceiling(d, q_arr, i):
        acc = jnp.uint32(0)
        for c in range(params.crt_count):
            q_limbs = sj._to_limbs_i8(q_arr[c] + i)
            q_stack = jnp.concatenate(q_limbs, axis=-1)
            for k in range(L):
                z = jnp.einsum("zij,zjr->zir",
                               d[c * L + k].reshape(Z, M, dim0), q_stack,
                               preferred_element_type=jnp.int32)
                acc = acc + z.sum(dtype=jnp.int32).astype(jnp.uint32)
        return acc

    if "ceiling" in FORMS:
        t = timed(ceiling, (db, qa))
        print(f"ceiling  {t*1e3:7.2f} ms  ({nbytes/t/1e9:5.0f} GB/s)",
              flush=True)

    # --- current production form ---
    def current(d, q_arr, i):
        out = sj.firstdim_multiply(params, d, q_arr + i)
        return out.sum(dtype=jnp.uint32)

    if "current" in FORMS:
        t = timed(current, (db, qa))
        print(f"current  {t*1e3:7.2f} ms  ({nbytes/t/1e9:5.0f} GB/s)",
              flush=True)

    # --- mchunk: current epilogue, fori_loop over M-chunks (slices view
    # the planes in place; per-chunk intermediates can stay on-chip) ---
    def mchunk_of(chunk):
        def mchunk(d, q_arr, i):
            acc0 = jnp.uint32(0)
            for c, q in enumerate(params.moduli):
                q_limbs = sj._to_limbs_i8(q_arr[c] + i)
                q_stack = jnp.concatenate(q_limbs, axis=-1)
                planes = [d[c * L + k].reshape(Z, M, dim0) for k in range(L)]

                def body(j, acc, planes=planes, q_stack=q_stack, q=q):
                    parts = [jnp.einsum(
                        "zij,zjr->zir",
                        jax.lax.dynamic_slice_in_dim(p, j * chunk, chunk, 1),
                        q_stack, preferred_element_type=jnp.int32)
                        for p in planes]
                    comb = sj._combine_scan_parts(parts, R, q)
                    return acc + comb.sum(dtype=jnp.uint32)

                acc0 = acc0 + jax.lax.fori_loop(0, M // chunk, body,
                                                jnp.uint32(0))
            return acc0

        return mchunk

    for chunk in (64, 128, 256):
        if M % chunk or "mchunk" not in FORMS:
            continue
        t = timed(mchunk_of(chunk), (db, qa))
        print(f"mchunk{chunk:<4d} {t*1e3:7.2f} ms  ({nbytes/t/1e9:5.0f}"
              f" GB/s)", flush=True)

    del db
    import gc
    gc.collect()

    # --- kconcat: limb-interleaved DB, weight-grouped single GEMM ---
    @jax.jit
    def gen_kconcat():
        k1 = jax.random.PRNGKey(0)
        outs = []
        for c, q in enumerate(params.moduli):
            u32 = jax.random.randint(
                jax.random.fold_in(k1, c),
                (params.poly_len, params.instances, trials, npr, dim0),
                0, q, dtype=jnp.uint32)
            limbs = [((u32 >> jnp.uint32(7 * k)) & jnp.uint32(127))
                     .astype(jnp.int8).reshape(Z, M, dim0) for k in range(L)]
            outs.append(jnp.concatenate(limbs, axis=-1))   # (Z, M, L*dim0)
        return tuple(outs)

    dbk = gen_kconcat()
    jax.block_until_ready(dbk)

    def kconcat(d, q_arr, i):
        acc0 = jnp.uint32(0)
        for c, q in enumerate(params.moduli):
            q_limbs = sj._to_limbs_i8(q_arr[c] + i)       # L x (z, dim0, R)
            zero = jnp.zeros_like(q_limbs[0])
            # big operand rows are [limb k block][dim0]; weight-s columns of
            # block k take query limb l = s - k (zero when out of range)
            blocks = [jnp.concatenate(
                [q_limbs[s - k] if 0 <= s - k < L else zero
                 for s in range(W)], axis=-1) for k in range(L)]
            qq = jnp.concatenate(blocks, axis=-2)         # (z, L*dim0, W*R)
            zs = jnp.einsum("zij,zjr->zir", d[c], qq,
                            preferred_element_type=jnp.int32)
            acc = None
            for s in range(W):
                p = zs[..., s * R : (s + 1) * R].astype(jnp.uint32)
                term = shoup_mulmod_lazy(p, (1 << (7 * s)) % q, q)
                acc = term if acc is None else acc + term
            acc = reduce_u32_mod_q(acc, q)
            acc0 = acc0 + acc.sum(dtype=jnp.uint32)
        return acc0

    if "kconcat" in FORMS:
        t = timed(kconcat, (dbk, qa))
        print(f"kconcat  {t*1e3:7.2f} ms  ({nbytes/t/1e9:5.0f} GB/s)",
              flush=True)

    # --- kconcatT: kconcat with the query operand TRANSPOSED
    # (z, W*R, L*dim0) — contraction over the minor axis of both operands.
    # At small R the non-T operand (z, L*dim0, W*R) pads its minor dim
    # W*R -> 128 (537 MB/channel of padding reads at R=2); the T form pads
    # only W*R -> next multiple of 8 in the second-minor position ---
    def kconcatT(d, q_arr, i):
        acc0 = jnp.uint32(0)
        for c, q in enumerate(params.moduli):
            qc = jnp.transpose(q_arr[c] + i, (0, 2, 1))   # (z, R, dim0)
            q_limbs = sj._to_limbs_i8(qc)                 # L x (z, R, dim0)
            zero = jnp.zeros_like(q_limbs[0])
            rows = [jnp.concatenate(
                [q_limbs[s - k] if 0 <= s - k < L else zero
                 for k in range(L)], axis=-1) for s in range(W)]
            qq = jnp.concatenate(rows, axis=-2)           # (z, W*R, L*dim0)
            zs = jnp.einsum("zij,zrj->zir", d[c], qq,
                            preferred_element_type=jnp.int32)
            acc = None
            for s in range(W):
                p = zs[..., s * R : (s + 1) * R].astype(jnp.uint32)
                term = shoup_mulmod_lazy(p, (1 << (7 * s)) % q, q)
                acc = term if acc is None else acc + term
            acc = reduce_u32_mod_q(acc, q)
            acc0 = acc0 + acc.sum(dtype=jnp.uint32)
        return acc0

    if "kconcatT" in FORMS:
        t = timed(kconcatT, (dbk, qa))
        print(f"kconcatT {t*1e3:7.2f} ms  ({nbytes/t/1e9:5.0f} GB/s)",
              flush=True)

    # --- ksplit: SAME kconcat layout, but a free reshape (Z,M,L*dim0) ->
    # (Z,M,L,dim0) recovers the current form's L-GEMM arithmetic (limb as a
    # free output axis => XLA lowers it as one GEMM with M'=M*L rows) — the
    # small-R serving form on the concat layout ---
    def ksplit(d, q_arr, i):
        acc0 = jnp.uint32(0)
        for c, q in enumerate(params.moduli):
            q_limbs = sj._to_limbs_i8(q_arr[c] + i)
            q_stack = jnp.concatenate(q_limbs, axis=-1)   # (z, dim0, L*R)
            out = jnp.einsum("zmkj,zjr->zmkr",
                             d[c].reshape(Z, M, L, dim0), q_stack,
                             preferred_element_type=jnp.int32)
            parts = [out[..., k, :] for k in range(L)]
            comb = sj._combine_scan_parts(parts, R, q)
            acc0 = acc0 + comb.sum(dtype=jnp.uint32)
        return acc0

    if "ksplit" in FORMS:
        t = timed(ksplit, (dbk, qa))
        print(f"ksplit   {t*1e3:7.2f} ms  ({nbytes/t/1e9:5.0f} GB/s)",
              flush=True)

    # --- kfused: kconcat with the epilogue as a pure elementwise+reduce
    # consumer of the ONE GEMM output (reshape (Z,M,W,R), per-w Shoup
    # constants broadcast, sum over W then one mod-reduce) — the shape XLA
    # can fuse into the GEMM so the int32 block never round-trips HBM ---
    from sdk_tpu.ops.modops import mul32_hi

    def kfused(d, q_arr, i):
        acc0 = jnp.uint32(0)
        for c, q in enumerate(params.moduli):
            q_limbs = sj._to_limbs_i8(q_arr[c] + i)
            zero = jnp.zeros_like(q_limbs[0])
            blocks = [jnp.concatenate(
                [q_limbs[s - k] if 0 <= s - k < L else zero
                 for s in range(W)], axis=-1) for k in range(L)]
            qq = jnp.concatenate(blocks, axis=-2)
            zs = jnp.einsum("zij,zjr->zir", d[c], qq,
                            preferred_element_type=jnp.int32)
            p4 = zs.reshape(Z, M, W, R).astype(jnp.uint32)
            cs = np.array([(1 << (7 * s)) % q for s in range(W)],
                          dtype=np.uint32)
            csh = np.array([((1 << (7 * s)) % q << 32) // q
                            for s in range(W)], dtype=np.uint64
                           ).astype(np.uint32)
            cw = jnp.asarray(cs)[None, None, :, None]
            cwsh = jnp.asarray(csh)[None, None, :, None]
            hi = mul32_hi(p4, jnp.broadcast_to(cwsh, p4.shape))
            terms = p4 * cw - hi * jnp.uint32(q)      # < 2q each
            acc = reduce_u32_mod_q(terms.sum(axis=2, dtype=jnp.uint32), q)
            acc0 = acc0 + acc.sum(dtype=jnp.uint32)
        return acc0

    if "kfused" in FORMS:
        t = timed(kfused, (dbk, qa))
        print(f"kfused   {t*1e3:7.2f} ms  ({nbytes/t/1e9:5.0f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()

"""Race alternative GEMM geometries for the first-dim scan on the real chip.

The production form batches (Z*inst*trials) tiny GEMMs of (num_per, dim0)
with the query repeated per trial; the M-merged form folds inst*trials into
the GEMM M axis (a free reshape — those axes are adjacent to num_per in the
plane layout) so the batch is Z and M = inst*trials*num_per, with no query
repeat. Outputs are bit-identical (int32 partial sums are exact in any
order). SPEED_OF_LIGHT.md: the inst=4 index streams at 460 GB/s vs 680 for
inst=1 — this probes whether the GEMM geometry is the gap.

Usage: python tools/profile_scan_forms.py [R ...]   (default R = 2 32)
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sdk_tpu.params import params_from_json
from sdk_tpu.ops import spiral_jax as sj


def scan_m_merged(params, db_planes, q_arr):
    """firstdim_multiply with inst*trials merged into the GEMM M axis."""
    Z, inst, trials, npr, dim0 = db_planes[0].shape
    R = q_arr.shape[-1]
    IT = inst * trials
    out_ch = []
    for c, q in enumerate(params.moduli):
        q_limbs = sj._to_limbs_i8(q_arr[c])
        q_stack = jnp.concatenate(q_limbs, axis=-1)      # (z, j, L*R)
        parts = [jnp.einsum("zij,zjr->zir",
                            db_planes[c * sj.NUM_LIMBS + k].reshape(
                                Z, IT * npr, dim0), q_stack,
                            preferred_element_type=jnp.int32)
                 for k in range(sj.NUM_LIMBS)]
        partials = [None] * (2 * sj.NUM_LIMBS - 1)
        for k in range(sj.NUM_LIMBS):
            for l in range(sj.NUM_LIMBS):
                m = parts[k][..., l * R : (l + 1) * R]
                s = k + l
                partials[s] = m if partials[s] is None else partials[s] + m
        acc = None
        for s, p in enumerate(partials):
            term = sj.shoup_mulmod_lazy(
                p.astype(jnp.uint32), (1 << (sj.LIMB_BITS * s)) % q, q)
            acc = term if acc is None else acc + term
        acc = sj.reduce_u32_mod_q(acc, q)
        out_ch.append(acc.reshape(Z, inst, trials, npr, R))
    return jnp.stack(out_ch, axis=0)


def operands(params, R):
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
            for k in range(sj.NUM_LIMBS):
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


def timed(fn, db, qa, iters=6):
    """Device-side time via k-loop differencing (k=1 vs 5 chained scans in
    one dispatch): the ~28 ms tunnel RTT cancels exactly."""
    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def scan_k(d, q, k):
        def body(i, acc):
            return acc + fn(d, q + i.astype(jnp.uint32)).sum(
                dtype=jnp.uint32)
        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    def t_of(k):
        int(scan_k(db, qa, k))
        t0 = time.perf_counter()
        for _ in range(iters):
            int(scan_k(db, qa, k))
        return (time.perf_counter() - t0) / iters

    return max((t_of(5) - t_of(1)) / 4, 1e-9)


def main():
    rs = [int(a) for a in sys.argv[1:]] or [2, 32]
    for inst in (1, 4):
        cfg = params_from_json(
            '{"n": 2, "nu_1": 9, "nu_2": 6, "p": 256, "q2_bits": 20,'
            ' "t_gsw": 8, "t_conv": 4, "t_exp_left": 8, "t_exp_right": 56,'
            f' "instances": {inst}, "db_item_size": 8192}}')
        for R in rs:
            db, qa, nbytes = operands(cfg, R)
            ref = np.asarray(jax.jit(
                lambda d, q: sj.firstdim_multiply(cfg, d, q))(db, qa))
            alt = np.asarray(jax.jit(
                lambda d, q: scan_m_merged(cfg, d, q))(db, qa))
            assert (ref == alt).all(), "forms disagree!"
            t_cur = timed(lambda d, q: sj.firstdim_multiply(cfg, d, q),
                          db, qa)
            t_alt = timed(lambda d, q: scan_m_merged(cfg, d, q), db, qa)
            print(f"inst={inst} R={R:3d} bytes={nbytes/1e9:5.2f}GB  "
                  f"batch-form {t_cur*1e3:7.2f} ms ({nbytes/t_cur/1e9:5.0f}"
                  f" GB/s)   M-merged {t_alt*1e3:7.2f} ms "
                  f"({nbytes/t_alt/1e9:5.0f} GB/s)", flush=True)
            del db, qa
            import gc
            gc.collect()


if __name__ == "__main__":
    main()

"""Standalone on-device fold profile at the 1 GiB bucket shape.

Times sj.fold_ciphertexts (and its stages) on the real chip with random
valid-range inputs at the params-store (9,6) v1 inst4 shape — independent
of the 8.6 GB DB index, so it runs in seconds. Timing fence = value fetch
(block_until_ready does not await remote completion through the tunnel).

Usage:
    python tools/profile_fold.py                  # single-query fold
    python tools/profile_fold.py --stages         # per-stage split
    python tools/profile_fold.py --batch 16       # NQ-batched fold scaling
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from sdk_tpu.ops import spiral_jax as sj
from sdk_tpu.params_store import get_params_from_store


def fence(x) -> None:
    """Honest completion fence through the tunnel: fetch a reduced value."""
    int(jnp.sum(jnp.asarray(x, dtype=jnp.uint32) & jnp.uint32(1), dtype=jnp.uint32))


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/sdk_tpu_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    params = get_params_from_store(15, 32768)  # 1 GiB: (9,6) v1, inst 4
    it = params.instances * params.n * params.n
    num_per = 1 << params.db_dim_2
    n = params.poly_len
    ell = 2 * params.t_gsw
    print(f"shape: IT={it} num_per={num_per} ell={ell} n={n} "
          f"crt={params.crt_count}", flush=True)

    rng = np.random.default_rng(0)
    q0, q1 = params.moduli
    hi = rng.integers(0, params.modulus >> 32, (it, num_per, 2, 1, n),
                      dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, (it, num_per, 2, 1, n),
                      dtype=np.uint64).astype(np.uint32)
    vf = np.empty((params.db_dim_2, 2, ell, params.crt_count, n), np.uint32)
    for c, q in enumerate(params.moduli):
        vf[..., c, :] = rng.integers(0, q, vf.shape[:3] + (n,), dtype=np.uint64)

    d_hi = jax.device_put(jnp.asarray(hi))
    d_lo = jax.device_put(jnp.asarray(lo))
    d_vf = jax.device_put(jnp.asarray(vf))

    # gadget NTT constant, exactly as server_jax.__init__ builds it
    from sdk_tpu import poly as hpoly

    gadget_ntt = hpoly.to_ntt(
        params, hpoly.build_gadget(params, 2, ell)).astype(np.uint32)
    d_g = jax.device_put(jnp.asarray(gadget_ntt))

    @jax.jit
    def fold(a, b, v, g):
        vneg = sj.get_v_folding_neg(params, v, g)
        return sj.fold_ciphertexts(params, a, b, v, vneg)

    t0 = time.time()
    out = fold(d_hi, d_lo, d_vf, d_g)
    fence(out[0])
    print(f"compile+first: {time.time() - t0:.2f}s", flush=True)

    times = []
    for _ in range(7):
        t0 = time.time()
        out = fold(d_hi, d_lo, d_vf, d_g)
        fence(out[0])
        times.append(time.time() - t0)
    times.sort()
    print(f"fold p50: {times[len(times) // 2] * 1e3:.1f} ms  "
          f"min: {times[0] * 1e3:.1f} ms", flush=True)




def stages() -> None:
    """Per-stage split at round-0 shapes (the full fold is ~2x round 0:
    round work halves geometrically)."""
    jax.config.update("jax_compilation_cache_dir", "/tmp/sdk_tpu_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    params = get_params_from_store(15, 32768)
    it = params.instances * params.n * params.n
    half = (1 << params.db_dim_2) // 2
    n = params.poly_len
    ell = 2 * params.t_gsw
    rng = np.random.default_rng(0)
    hi = rng.integers(0, params.modulus >> 32, (it, 2 * half, 2, 1, n),
                      dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, (it, 2 * half, 2, 1, n),
                      dtype=np.uint64).astype(np.uint32)
    vc = np.empty((2, 2 * ell, params.crt_count, n), np.uint32)
    for c, q in enumerate(params.moduli):
        vc[..., c, :] = rng.integers(0, q, (2, 2 * ell, n), dtype=np.uint64)
    d_hi, d_lo = jax.device_put(jnp.asarray(hi)), jax.device_put(jnp.asarray(lo))
    d_vc = jax.device_put(jnp.asarray(vc))

    @jax.jit
    def digits_ntt(a, b):
        ga = sj.gadget_digits(params, a[:, :half], b[:, :half], ell, 2)
        gb = sj.gadget_digits(params, a[:, half:], b[:, half:], ell, 2)
        return sj.to_ntt_no_reduce(params, jnp.concatenate([ga, gb], axis=-3))

    g_ntt = digits_ntt(d_hi, d_lo)
    fence(g_ntt)

    @jax.jit
    def mm(v, g):
        return sj.matmul_mod(params, v, g)

    f = mm(d_vc, g_ntt)
    fence(f)

    @jax.jit
    def intt(x):
        return sj.from_ntt(params, x)

    o = intt(f)
    fence(o[0])

    for name, fn, args in (("digits+fwdNTT", digits_ntt, (d_hi, d_lo)),
                           ("matmul_mod", mm, (d_vc, g_ntt)),
                           ("from_ntt", intt, (f,))):
        ts = []
        for _ in range(7):
            t0 = time.time()
            r = fn(*args)
            fence(r[0] if isinstance(r, tuple) else r)
            ts.append(time.time() - t0)
        ts.sort()
        print(f"{name}: p50 {ts[len(ts) // 2] * 1e3:.1f} ms "
              f"min {ts[0] * 1e3:.1f} ms", flush=True)


def batched(nq: int) -> None:
    """Race the per-query-loop fold against the cross-query batched fold
    at an NQ-query batch (random per-query GSW keys). Validates bit-exact
    equality of the two forms, then times both on the chip."""
    jax.config.update("jax_compilation_cache_dir", "/tmp/sdk_tpu_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    params = get_params_from_store(15, 32768)  # 1 GiB: (9,6) v1, inst 4
    it = params.instances * params.n * params.n
    num_per = 1 << params.db_dim_2
    n = params.poly_len
    ell = 2 * params.t_gsw
    print(f"shape: NQ={nq} IT={it} num_per={num_per} ell={ell} n={n}",
          flush=True)

    rng = np.random.default_rng(0)
    hi = rng.integers(0, params.modulus >> 32, (nq, it, num_per, 2, 1, n),
                      dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, (nq, it, num_per, 2, 1, n),
                      dtype=np.uint64).astype(np.uint32)
    vf = np.empty((nq, params.db_dim_2, 2, ell, params.crt_count, n),
                  np.uint32)
    for c, q in enumerate(params.moduli):
        vf[..., c, :] = rng.integers(0, q, vf.shape[:4] + (n,),
                                     dtype=np.uint64)
    d_hi = jax.device_put(jnp.asarray(hi))
    d_lo = jax.device_put(jnp.asarray(lo))
    d_vf = jax.device_put(jnp.asarray(vf))

    from sdk_tpu import poly as hpoly

    gadget_ntt = hpoly.to_ntt(
        params, hpoly.build_gadget(params, 2, ell)).astype(np.uint32)
    d_g = jax.device_put(jnp.asarray(gadget_ntt))

    @jax.jit
    def fold_loop(a, b, v, g):
        outs = []
        for i in range(nq):
            vneg = sj.get_v_folding_neg(params, v[i], g)
            outs.append(sj.fold_ciphertexts(params, a[i], b[i], v[i], vneg))
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]))

    @jax.jit
    def fold_batched(a, b, v, g):
        vneg = sj.get_v_folding_neg(params, v, g)
        return sj.fold_ciphertexts(params, a, b, v, vneg)

    for name, fn in (("loop", fold_loop), ("batched", fold_batched)):
        t0 = time.time()
        out = fn(d_hi, d_lo, d_vf, d_g)
        fence(out[0])
        print(f"{name} compile+first: {time.time() - t0:.2f}s", flush=True)
        times = []
        for _ in range(5):
            t0 = time.time()
            out = fn(d_hi, d_lo, d_vf, d_g)
            fence(out[0])
            times.append(time.time() - t0)
        times.sort()
        print(f"{name} fold NQ={nq}: p50 {times[len(times) // 2] * 1e3:.1f}"
              f" ms  min {times[0] * 1e3:.1f} ms", flush=True)

    a = jax.jit(fold_loop)(d_hi, d_lo, d_vf, d_g)
    b = jax.jit(fold_batched)(d_hi, d_lo, d_vf, d_g)
    same = bool(jnp.all(a[0] == b[0]) & jnp.all(a[1] == b[1]))
    print(f"bit-exact loop vs batched: {same}", flush=True)
    assert same


def _matmul_mod_kloop(params, a, b):
    """LOSING variant kept for the race record: the k-contraction as a
    chain of lazily-accumulated elementwise mulmods (one b[k] slice per
    step) instead of matmul_mod's broadcast product + chunked tree sum.
    Measured 3x SLOWER at the fold's round-0 NQ=4 shape on v5e (81.5 vs
    27.8 ms): XLA already fuses the broadcast form's product+reduction —
    it runs at ~67 G generic mulmod/s (~VPU peak for the 18-op mulmod) —
    while the serialized accumulator chain defeats its scheduling. The
    fold matmul is COMPUTE-bound, not traffic-bound."""
    import jax.numpy as jnp

    from sdk_tpu.ops.modops import (cond_sub_q, mulmod,
                                    reduce_u32_mod_q_lazy)

    batch = b.shape[:-4]
    ab = a.ndim - 4
    ra, k = a.shape[ab], a.shape[ab + 1]
    cb = b.shape[-3]
    n = b.shape[-1]
    a_bshape = batch[:ab] + (1,) * (len(batch) - ab) + (ra, 1, n)
    out_ch = []
    for c, q in enumerate(params.moduli):
        ac = a[..., c, :]
        bc = b[..., c, :]
        acc, pending = None, 0
        for kk in range(k):
            a_k = ac[..., :, kk, :].reshape(a_bshape)
            b_k = bc[..., kk, :, :][..., None, :, :]
            t = mulmod(a_k, b_k, q)                       # < q
            acc = t if acc is None else acc + t
            pending += 1
            if pending == 6 and kk + 1 < k:
                acc = reduce_u32_mod_q_lazy(acc, q)       # < 2q
                pending = 1
        out_ch.append(cond_sub_q(reduce_u32_mod_q_lazy(acc, q), q)
                      if pending > 1 else cond_sub_q(acc, q))
    out = jnp.stack(out_ch, axis=-2)
    return jnp.broadcast_to(out, batch + (ra, cb, params.crt_count, n))


def mm_race(nq: int) -> None:
    """Race matmul_mod (broadcast product + chunked tree sum) against
    the k-loop chain at the fold's round-0 shape."""
    jax.config.update("jax_compilation_cache_dir", "/tmp/sdk_tpu_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    params = get_params_from_store(15, 32768)
    it = params.instances * params.n * params.n
    half = (1 << params.db_dim_2) // 2
    n = params.poly_len
    ell = 2 * params.t_gsw
    rng = np.random.default_rng(0)
    # round-0 operands: g_ntt (NQ, IT, half, 2*ell, 1, crt, n),
    # v_cat (NQ, 2, 2*ell, crt, n)
    g = np.empty((nq, it, half, 2 * ell, 1, params.crt_count, n), np.uint32)
    v = np.empty((nq, 2, 2 * ell, params.crt_count, n), np.uint32)
    for c, q in enumerate(params.moduli):
        g[..., c, :] = rng.integers(0, q, g.shape[:-2] + (n,),
                                    dtype=np.uint64)
        v[..., c, :] = rng.integers(0, q, v.shape[:-2] + (n,),
                                    dtype=np.uint64)
    d_g, d_v = jax.device_put(jnp.asarray(g)), jax.device_put(jnp.asarray(v))
    gb = g.nbytes / 1e9
    print(f"round-0 matmul NQ={nq}: g_ntt {gb:.2f} GB, k={2 * ell}",
          flush=True)

    import functools

    for name, f in (("broadcast", sj.matmul_mod),
                    ("kloop", _matmul_mod_kloop)):
        @functools.partial(jax.jit, static_argnums=2)
        def run(v_, g_, k, f=f):
            def body(i, acc):
                out = f(params, v_, g_ + i.astype(jnp.uint32))
                return acc + out.sum(dtype=jnp.uint32)

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        def t_of(k):
            int(run(d_v, d_g, k))
            best = 1e9
            for _ in range(6):
                t0 = time.time()
                int(run(d_v, d_g, k))
                best = min(best, time.time() - t0)
            return best

        ms = max((t_of(5) - t_of(1)) / 4, 1e-9) * 1e3
        print(f"{name:10s} {ms:8.2f} ms  ({g.nbytes / (ms / 1e3) / 1e9:5.0f}"
              f" GB/s over g_ntt)", flush=True)

    r1 = jax.jit(lambda v_, g_: sj.matmul_mod(params, v_, g_))(d_v, d_g)
    r2 = jax.jit(lambda v_, g_: _matmul_mod_kloop(params, v_, g_))(d_v, d_g)
    same = bool(jnp.all(r1 == r2))
    print(f"bit-exact: {same}", flush=True)
    assert same


if __name__ == "__main__" and "--mm" in sys.argv:
    mm_race(int(sys.argv[sys.argv.index("--mm") + 1]))
elif __name__ == "__main__" and "--stages" in sys.argv:
    stages()
elif __name__ == "__main__" and "--batch" in sys.argv:
    batched(int(sys.argv[sys.argv.index("--batch") + 1]))
elif __name__ == "__main__":
    main()

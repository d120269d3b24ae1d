"""Standalone on-device fold profile at the 1 GiB bucket shape.

Times sj.fold_ciphertexts (and its stages) on the real chip with random
valid-range inputs at the params-store (9,6) v1 inst4 shape — independent
of the 8.6 GB DB index, so it runs in seconds. Timing fence = value fetch
(block_until_ready does not await remote completion through the tunnel).

Usage: python tools/profile_fold.py [--rounds]    # --rounds: per-round split
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


if __name__ == "__main__" and "--stages" in sys.argv:
    stages()
elif __name__ == "__main__":
    main()

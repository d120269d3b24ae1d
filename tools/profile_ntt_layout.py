"""Race the two NTT stage layouts (ntt_jax: "lane" vs "poly") on device.

Hypothesis being tested: the lane layout runs 7 of its 11 stages with
half-block size t < 128, i.e. butterflies that interleave *within* 128-lane
vector registers; the poly-major layout trades two transposes per call for
zero lane crossings at every stage (twiddles broadcast per row, batch in
lanes). Both are word-identical (tests/test_ntt_jax.py pins it); this tool
decides which one the fold should use — the digit NTTs are ~60% of the
fold, which is ~80% of the batch-16 device time (docs/SPEED_OF_LIGHT.md).

Timing: k-loop differencing on device (input perturbed per iteration to
defeat CSE); fence = scalar fetch (tunnel-honest, BASELINE.md).

Usage:
    python tools/profile_ntt_layout.py               # fwd NTT batch sweep
    python tools/profile_ntt_layout.py --fold        # full fold, both layouts
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from sdk_tpu.ops import ntt_jax
from sdk_tpu.ops import spiral_jax as sj
from sdk_tpu.params_store import get_params_from_store


def _cache() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/sdk_tpu_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def ntt_sweep() -> None:
    _cache()
    params = get_params_from_store(15, 32768)  # (9,6) v1 — the 1 GiB shape
    n = params.poly_len
    rng = np.random.default_rng(0)

    for batch in (256, 1024, 3584, 14336):
        # lazy-range inputs, as the fold's unsigned digits (< 4q)
        x = rng.integers(0, 4 * min(params.moduli),
                         (batch, params.crt_count, n), dtype=np.uint64)
        d_x = jax.device_put(jnp.asarray(x.astype(np.uint32)))

        results = {}
        for layout in ("lane", "poly"):
            def run_k(v, k, layout=layout):
                def body(i, acc):
                    out = ntt_jax.ntt_forward(
                        params, v + i.astype(jnp.uint32), layout=layout)
                    return acc + out.sum(dtype=jnp.uint32)

                return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

            runj = jax.jit(run_k, static_argnums=1)

            def t_of(k):
                int(runj(d_x, k))
                best = 1e9
                for _ in range(6):
                    t0 = time.time()
                    int(runj(d_x, k))
                    best = min(best, time.time() - t0)
                return best

            ms = max((t_of(5) - t_of(1)) / 4, 1e-9) * 1e3
            results[layout] = ms
            print(f"batch {batch:6d}  {layout:5s}  {ms:8.2f} ms  "
                  f"({ms * 1e3 / batch:.3f} us/poly)", flush=True)
        r = results["lane"] / results["poly"]
        print(f"batch {batch:6d}  poly-major speedup: {r:.2f}x", flush=True)

        a = jax.jit(lambda v: ntt_jax.ntt_forward(params, v, layout="lane"))(d_x)
        b = jax.jit(lambda v: ntt_jax.ntt_forward(params, v, layout="poly"))(d_x)
        assert bool(jnp.all(a == b)), "layouts diverged"
    print("bit-exact: True", flush=True)


def fold_race() -> None:
    """Full single-query fold under each layout (DEFAULT_LAYOUT is read at
    trace time, so each fresh jit wrapper traces with the layout set)."""
    _cache()
    params = get_params_from_store(15, 32768)
    it = params.instances * params.n * params.n
    num_per = 1 << params.db_dim_2
    n = params.poly_len
    ell = 2 * params.t_gsw
    rng = np.random.default_rng(0)
    hi = rng.integers(0, params.modulus >> 32, (it, num_per, 2, 1, n),
                      dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, (it, num_per, 2, 1, n),
                      dtype=np.uint64).astype(np.uint32)
    vf = np.empty((params.db_dim_2, 2, ell, params.crt_count, n), np.uint32)
    for c, q in enumerate(params.moduli):
        vf[..., c, :] = rng.integers(0, q, vf.shape[:3] + (n,),
                                     dtype=np.uint64)
    d_hi, d_lo = jax.device_put(jnp.asarray(hi)), jax.device_put(jnp.asarray(lo))
    d_vf = jax.device_put(jnp.asarray(vf))

    from sdk_tpu import poly as hpoly

    gadget_ntt = hpoly.to_ntt(
        params, hpoly.build_gadget(params, 2, ell)).astype(np.uint32)
    d_g = jax.device_put(jnp.asarray(gadget_ntt))

    outs = {}
    for layout in ("lane", "poly"):
        ntt_jax.DEFAULT_LAYOUT = layout

        @jax.jit
        def fold(a, b, v, g):
            vneg = sj.get_v_folding_neg(params, v, g)
            return sj.fold_ciphertexts(params, a, b, v, vneg)

        t0 = time.time()
        out = fold(d_hi, d_lo, d_vf, d_g)
        int(jnp.sum(out[0] & jnp.uint32(1), dtype=jnp.uint32))
        print(f"{layout} compile+first: {time.time() - t0:.2f}s", flush=True)
        times = []
        for _ in range(7):
            t0 = time.time()
            out = fold(d_hi, d_lo, d_vf, d_g)
            int(jnp.sum(out[0] & jnp.uint32(1), dtype=jnp.uint32))
            times.append(time.time() - t0)
        times.sort()
        print(f"{layout} fold: p50 {times[len(times) // 2] * 1e3:.1f} ms  "
              f"min {times[0] * 1e3:.1f} ms", flush=True)
        outs[layout] = (np.asarray(out[0]), np.asarray(out[1]))
    same = all(np.array_equal(outs["lane"][i], outs["poly"][i])
               for i in (0, 1))
    print(f"bit-exact lane vs poly: {same}", flush=True)
    assert same


if __name__ == "__main__" and "--fold" in sys.argv:
    fold_race()
elif __name__ == "__main__":
    ntt_sweep()

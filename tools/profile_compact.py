"""Compact-vs-dense scan crossover on the real chip at the 1 GiB config.

Measures device-side single-query firstdim_multiply latency (k-loop
differencing cancels the tunnel RTT) for the dense limb-plane layout and
for CompactDb at several per-bin capacities. The crossover fill fraction
justifies kv_server.dense_migrate_fill.

Usage: python tools/profile_compact.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from sdk_tpu.ops import spiral_jax as sj
from sdk_tpu.params_store import get_params_from_store


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/sdk_tpu_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    params = get_params_from_store(15, 32768)  # (9,6) v1 inst4 = 1 GiB bucket
    dim0 = 1 << params.db_dim_1
    num_per = 1 << params.db_dim_2
    trials = params.n * params.n
    inst = params.instances

    @jax.jit
    def gen_q():
        return jnp.stack([
            jax.random.randint(jax.random.PRNGKey(10 + c),
                               (params.poly_len, dim0, 2), 0, q,
                               dtype=jnp.uint32)
            for c, q in enumerate(params.moduli)])

    q_dev = gen_q()

    @functools.partial(jax.jit, static_argnums=2)
    def scan_k(db, q_arr, k):
        def body(i, acc):
            out = sj.firstdim_multiply(params, db,
                                       q_arr + i.astype(jnp.uint32))
            return acc + out.sum(dtype=jnp.uint32)

        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    def timed(db, iters=6):
        int(scan_k(db, q_dev, 1))
        int(scan_k(db, q_dev, 9))
        t1 = t9 = 0.0
        for _ in range(iters):
            t0 = time.perf_counter()
            int(scan_k(db, q_dev, 1))
            t1 += time.perf_counter() - t0
            t0 = time.perf_counter()
            int(scan_k(db, q_dev, 9))
            t9 += time.perf_counter() - t0
        return (t9 - t1) / iters / 8 * 1e3

    def gen_compact(cap):
        @jax.jit
        def gen():
            planes = []
            for c, q in enumerate(params.moduli):
                u32 = jax.random.randint(
                    jax.random.PRNGKey(c),
                    (params.poly_len, inst, trials, num_per, cap), 0, q,
                    dtype=jnp.uint32)
                for k in range(sj.NUM_LIMBS):
                    planes.append(((u32 >> jnp.uint32(7 * k))
                                   & jnp.uint32(127)).astype(jnp.int8))
            idx_j = jax.random.randint(jax.random.PRNGKey(99),
                                       (num_per, cap), 0, dim0,
                                       dtype=jnp.int32)
            return tuple(planes), idx_j

        planes, idx_j = gen()
        jax.block_until_ready(planes)
        return sj.CompactDb(planes, idx_j)

    for cap in (8, 32, 64, 128, 256):
        db = gen_compact(cap)
        ms = timed(db)
        print(f"compact cap={cap:4d} (fill {cap / dim0:5.1%}): "
              f"{ms:7.2f} ms device-side", flush=True)
        del db

    @jax.jit
    def gen_dense():
        planes = []
        for c, q in enumerate(params.moduli):
            u32 = jax.random.randint(
                jax.random.PRNGKey(c),
                (params.poly_len, inst, trials, num_per, dim0), 0, q,
                dtype=jnp.uint32)
            for k in range(sj.NUM_LIMBS):
                planes.append(((u32 >> jnp.uint32(7 * k))
                               & jnp.uint32(127)).astype(jnp.int8))
        return tuple(planes)

    dense = gen_dense()
    jax.block_until_ready(dense)
    ms = timed(dense)
    print(f"dense   dim0={dim0:4d}              : {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

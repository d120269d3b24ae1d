"""Benchmark: encrypted-DB scan throughput of the Spiral first-dim multiply
on the real TPU chip, with the production 16-query batch (one DB pass
amortized over the batch — the serving pattern; reference batching advice
docs/docs/performance.mdx, SURVEY 2.8).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the Spiral paper's ~1 GB/s/core CPU DB-scan design point
(BASELINE.md; the reference publishes no absolute numbers). vs_baseline is
the multiple over 1 GB/s.
"""

from __future__ import annotations

import json
import time

import numpy as np

NUM_QUERIES = 16


def main():
    import jax
    import jax.numpy as jnp

    from sdk_tpu.params import params_from_json
    from sdk_tpu.ops import spiral_jax as sj

    # Production-shaped scan: dim0=512, num_per=64 (nu_1=9, nu_2=6), n=2.
    params = params_from_json(
        '{"n": 2, "nu_1": 9, "nu_2": 6, "p": 256, "q2_bits": 20, "t_gsw": 8,'
        ' "t_conv": 4, "t_exp_left": 8, "t_exp_right": 56, "instances": 1,'
        ' "db_item_size": 8192}'
    )
    dim0 = 1 << params.db_dim_1
    num_per = 1 << params.db_dim_2
    trials = params.n * params.n
    R = 2 * NUM_QUERIES

    # generate operands ON DEVICE (uploading a multi-GB DB through the axon
    # tunnel is slow and flaky); values uniform in [0, q_c), then decompose
    # once into the int8 limb storage layout (the serving format)
    @jax.jit
    def gen():
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        planes, chans_q = [], []
        for c, q in enumerate(params.moduli):
            u32 = jax.random.randint(
                jax.random.fold_in(k1, c),
                (params.poly_len, 1, trials, num_per, dim0),
                0, q, dtype=jnp.uint32)
            for k in range(sj.NUM_LIMBS):
                planes.append(
                    ((u32 >> jnp.uint32(7 * k)) & jnp.uint32(127))
                    .astype(jnp.int8))
            chans_q.append(jax.random.randint(
                jax.random.fold_in(k2, c), (params.poly_len, dim0, R),
                0, q, dtype=jnp.uint32))
        # tuple of crt*L planes (z, inst=1, trials, num_per, dim0) int8
        return tuple(planes), jnp.stack(chans_q, axis=0)

    db_dev, q_dev = gen()
    jax.block_until_ready(db_dev)

    @jax.jit
    def scan(db, q_arr):
        out = sj.firstdim_multiply(params, db, q_arr)
        # reduce to a scalar so each timed iteration fetches one word —
        # block_until_ready through the axon tunnel does not await remote
        # completion, so the fetch is the only honest fence.
        return out.sum(dtype=jnp.uint32)

    int(scan(db_dev, q_dev))  # compile + warm

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        int(scan(db_dev, q_dev))
    dt = (time.perf_counter() - t0) / iters

    # Bytes of encrypted DB scanned per query, in the reference's packed
    # representation (2 CRT residues per u64 => 8 bytes per coefficient),
    # aggregated over the query batch sharing the pass.
    db_bytes = trials * params.poly_len * num_per * dim0 * 8
    gbps = db_bytes * NUM_QUERIES / dt / 1e9
    baseline_gbps = 1.0  # Spiral paper ~1 GB/s/core CPU design point
    print(json.dumps({
        "metric": "spiral_scan_throughput_batch16",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / baseline_gbps, 2),
    }))


if __name__ == "__main__":
    main()

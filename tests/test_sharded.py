"""Multi-chip sharded serving on the virtual 8-device CPU mesh: results must
be bit-identical to single-device serving (the chunk-and-reduce pattern as a
real collective)."""

import numpy as np

from sdk_tpu.ops.shard import DoublePirShardedScan, make_mesh, psum_mod

RNG = np.random.default_rng(23)


def test_psum_mod_exact():
    import functools
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from sdk_tpu.ops.shard import shard_map

    q = 268369921
    mesh = make_mesh(8, dp=1)
    x = RNG.integers(0, q, (8, 128), dtype=np.uint64).astype(np.uint32)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=P(("dp", "db"), None),
                       out_specs=P(("dp", "db"), None), check_rep=False)
    def f(shard):
        return psum_mod(shard, q, "db")

    got = np.asarray(jax.jit(f)(jnp.asarray(x)))
    want = (x.astype(np.uint64).sum(axis=0) % q).astype(np.uint32)
    for d in range(8):
        np.testing.assert_array_equal(got[d], want)


def test_spiral_sharded_matches_single_device():
    # Shared with __graft_entry__.dryrun_multichip (the driver's multi-chip
    # artifact): full protocol, trials over dp=2, dim0 rows over db=4,
    # response byte-identical to single-device + client decode bit-exact.
    from sdk_tpu.selfcheck import sharded_protocol_check

    sharded_protocol_check(8, dp=2)


def test_doublepir_sharded_firstlevel_matches_host():
    from sdk_tpu.doublepir.matrix import mat_mul_vec_packed, squish

    mesh = make_mesh(8, dp=1)
    rows, cols = 104, 12   # not divisible by 8 -> exercises padding
    db = RNG.integers(0, 1 << 10, (rows, cols * 3), dtype=np.uint64).astype(np.uint32)
    dbp = squish(db)
    q1 = RNG.integers(0, 1 << 32, (cols * 3, 1), dtype=np.uint64).astype(np.uint32)
    q2 = RNG.integers(0, 1 << 32, (cols * 3, 1), dtype=np.uint64).astype(np.uint32)

    scan = DoublePirShardedScan(mesh)
    db_sh = scan.shard_rows(dbp)
    got = scan.answer_firstlevel(db_sh, [q1, q2], rows)

    batch_sz = rows // 2
    want = np.vstack([mat_mul_vec_packed(dbp[:batch_sz], q1),
                      mat_mul_vec_packed(dbp[batch_sz:], q2)])
    np.testing.assert_array_equal(got, want)

"""Worker for the jax.distributed two-process DCN smoke test.

Each process owns a row shard of a u32 matrix (the DoublePIR chunk-sum
topology, reference bin/e2e.rs:60-106: partial answers summed across
nodes); the partial matvecs reduce with the exact mod-q psum over the
REAL multi-process collective path (gRPC between processes — what the
single-process CPU-mesh tests cannot exercise). Process 0 checks the
result word-for-word against the numpy oracle and exits nonzero on any
mismatch.

Usage (spawned by tests/test_multiproc.py, SDK_TPU_MULTIPROC=1):
    python tools/multiproc_worker.py <coordinator> <num_procs> <proc_id>
"""

from __future__ import annotations

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
# the local partial below accumulates in u64 (CPU-only smoke; the TPU
# kernels use 32-bit-lane formulations instead)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main() -> None:
    coordinator, num_procs, proc_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_procs,
                               process_id=proc_id)
    from sdk_tpu.ops.shard import psum_mod, shard_map

    devices = jax.devices()          # global: num_procs * 2 CPU devices
    ndev = len(devices)
    assert ndev == num_procs * 2, ndev
    mesh = Mesh(np.array(devices).reshape(ndev), ("db",))

    q = 268369921                    # Spiral CRT modulus 0
    rows, cols, nq = 8 * ndev, 64, 3
    rng = np.random.default_rng(7)   # same seed everywhere -> same data
    mat = rng.integers(0, q, (rows, cols), dtype=np.uint64).astype(np.uint32)
    vec = rng.integers(0, q, (cols, nq), dtype=np.uint64).astype(np.uint32)

    sh = NamedSharding(mesh, P("db", None))
    rep = NamedSharding(mesh, P(None, None))

    def put(arr, sharding):
        """Global array from per-device local shards (the multi-process
        placement path — plain device_put of a global array is
        single-process only)."""
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])

    mat_g = put(mat, sh)
    vec_g = put(vec, rep)

    @jax.jit
    def partial_matvec_psum(m, v):
        def local(m_loc, v_rep):
            # per-shard partial contraction, exact mod q (u64 accumulate
            # over 64 terms of (q-1)^2 < 2^56 stays < 2^62), then the
            # exact mod-q psum over the "db" axis — across PROCESSES here
            part = (m_loc.astype(jnp.uint64) @ v_rep.astype(jnp.uint64)
                    % jnp.uint64(q)).astype(jnp.uint32)
            return psum_mod(part, q, "db")

        return shard_map(local, mesh=mesh, in_specs=(P("db", None),
                                                     P(None, None)),
                         out_specs=P(None, None), check_rep=False)(m, v)

    out = np.asarray(partial_matvec_psum(mat_g, vec_g))

    # shard_map over "db" splits the ROW axis: each shard's partial is its
    # rows' contribution... but a matvec partial over rows is not a sum —
    # the chunk-sum pattern sums over the CONTRACTION axis. Re-derive the
    # oracle accordingly: each shard computes its rows @ vec, psum adds the
    # (rows/ndev, nq) blocks of DIFFERENT rows elementwise — the oracle is
    # the elementwise mod-q sum of the ndev row blocks.
    blocks = (mat.astype(np.uint64) @ vec.astype(np.uint64) % np.uint64(q))
    blocks = blocks.reshape(ndev, rows // ndev, nq)
    want = np.zeros((rows // ndev, nq), dtype=np.uint64)
    for b in blocks:
        want = (want + b) % np.uint64(q)

    ok = (out == want.astype(np.uint32)).all()
    if proc_id == 0:
        print(f"multiproc psum_mod ok={bool(ok)} ndev={ndev}", flush=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

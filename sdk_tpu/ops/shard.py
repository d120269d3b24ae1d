"""Multi-chip sharded serving for the Spiral pipeline.

The reference's only cross-node pattern is "shard DB rows, sum partial
responses" (lib/doublepir/src/bin/e2e.rs:60-106; enabled by LWE linearity).
On TPU this becomes a first-class collective: the encrypted DB tensor is
sharded over a device mesh and partial ciphertext sums are reduced with
psum over ICI.

Mesh axes:
  dp : data parallel over instances*trials (independent PIR sub-problems;
       reference rayon par_iter, lib/server/src/server.rs:53-88)
  db : first-dimension rows (dim0) of the DB tensor; firstdim partial sums
       are psum-reduced over this axis.

Overflow discipline: per-shard partial sums are canonical in [0, q); they
are psum'd as 16-bit halves so any mesh size up to 2^16 devices stays exact
in uint32, then recombined mod q.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map_new

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map_new(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=check_rep)
except ImportError:  # older jax (pre-0.8): experimental API, check_rep kwarg
    from jax.experimental.shard_map import shard_map

from ..params import Params
from . import spiral_jax as sj
from .modops import U32, cond_sub, cond_sub_q, reduce_u32_mod_q, shoup_mulmod_lazy


def psum_mod(x, q: int, axis_name: str):
    """Exact mod-q psum of values in [0, q) over a mesh axis."""
    lo = x & U32(0xFFFF)
    hi = x >> U32(16)
    lo_s = jax.lax.psum(lo, axis_name)          # < D * 2^16
    hi_s = jax.lax.psum(hi, axis_name)          # < D * 2^12
    r = shoup_mulmod_lazy(hi_s, (1 << 16) % q, q) + reduce_u32_mod_q(lo_s, q)
    r = cond_sub(r, 2 * q)
    return cond_sub_q(r, q)


def make_mesh(n_devices: int | None = None, dp: int | None = None):
    """1- or 2-axis mesh over the available devices: (dp, db)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if dp is None:
        dp = 1
    assert n % dp == 0
    arr = np.array(devs).reshape(dp, n // dp)
    return Mesh(arr, axis_names=("dp", "db"))


def mesh_from_spec(spec: str) -> Mesh:
    """Parse a serving-config mesh spec into a (dp, db) mesh.

    Accepted forms: "8" (8 devices, all on the db axis), "db=8",
    "dp=2,db=4", "dp=2" (db gets the rest of the devices).
    """
    spec = spec.strip()
    if not spec:
        raise ValueError("empty mesh spec")
    axes: dict[str, int] = {}
    if "=" not in spec:
        axes["db"] = int(spec)
    else:
        for part in spec.split(","):
            k, v = part.split("=")
            k = k.strip()
            if k not in ("dp", "db"):
                raise ValueError(f"unknown mesh axis {k!r} (want dp/db)")
            axes[k] = int(v)
    dp = axes.get("dp", 1)
    if "db" in axes:
        n = dp * axes["db"]
    else:
        n = len(jax.devices())
    return make_mesh(n, dp=dp)


class ShardedSpiralScan:
    """Sharded scan+fold step builder for a SpiralServerJax-compatible state."""

    def __init__(self, params: Params, mesh: Mesh, gadget_ntt_u32: np.ndarray,
                 dense_layout: str = "latency"):
        self.params = params
        self.mesh = mesh
        self.gadget_ntt_u32 = gadget_ntt_u32
        self.dense_layout = dense_layout

        # dim0 (the scan contraction) shards over "db" in BOTH dense
        # layouts — it is the last axis of each array either way, so every
        # local shard is itself a valid layout and the exact mod-q psum
        # below is unchanged (see server_jax.db_tensor_to_device)
        if dense_layout == "throughput":
            # tuple of crt channels (z, inst, trials, num_per, L, dim0)
            plane_spec = P(None, None, "dp", None, None, "db")
            db_spec = tuple(plane_spec for _ in range(params.crt_count))
        else:
            # tuple of crt*L planes (z, inst, trials, num_per, dim0)
            plane_spec = P(None, None, "dp", None, "db")
            db_spec = tuple(plane_spec
                            for _ in range(params.crt_count * sj.NUM_LIMBS))
        q_spec = P(None, None, "db", None)
        fold_spec = P()  # replicated (small)
        out_spec = (P(None, "dp"), P(None, "dp"))

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(db_spec, q_spec, fold_spec),
            out_specs=out_spec, check_rep=False)
        def scan_fold(db, q_arr, v_folding):
            params = self.params
            v_folding_neg = sj.get_v_folding_neg(params, v_folding,
                                                 self.gadget_ntt_u32)
            # partial over the local dim0 shard, then exact mod-q psum
            partial = sj.firstdim_multiply(params, db, q_arr)
            full = jnp.stack([
                psum_mod(partial[c], q, "db")
                for c, q in enumerate(params.moduli)])
            # (crt, z, inst, T_local, num_per, 2) -> (IT, num_per, 2, 1, crt, z)
            cts = jnp.transpose(full, (2, 3, 4, 5, 0, 1))
            inst, t_local = cts.shape[:2]
            cts = cts.reshape((inst * t_local,) + cts.shape[2:])[
                :, :, :, None, :, :]
            hi, lo = sj.from_ntt(params, cts)
            h, l = sj.fold_ciphertexts(params, hi, lo, v_folding,
                                       v_folding_neg)
            shape = (inst, t_local) + h.shape[1:]
            return h.reshape(shape), l.reshape(shape)

        self.scan_fold = jax.jit(scan_fold)

        # Batched multi-query scan: one sharded DB pass with 2*NQ MXU
        # columns (composition of the query-batching pattern with the
        # row-shard psum — SURVEY 2.8). NQ is static per trace; jit
        # retraces per batch size.
        q_batch_spec = P(None, None, None, "db", None)
        out_batch_spec = (P(None, None, "dp"), P(None, None, "dp"))

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(db_spec, q_batch_spec, fold_spec),
            out_specs=out_batch_spec, check_rep=False)
        def scan_fold_batched(db, q_arrs, v_foldings):
            params = self.params
            nq = q_arrs.shape[0]
            # (crt, z, dim0_local, 2*NQ)
            q_wide = jnp.concatenate([q_arrs[i] for i in range(nq)], axis=-1)
            partial = sj.firstdim_multiply(params, db, q_wide)
            full = jnp.stack([
                psum_mod(partial[c], q, "db")
                for c, q in enumerate(params.moduli)])
            inst, t_local = full.shape[2], full.shape[3]
            num_per = full.shape[4]
            # chunk-mapped cross-query fold (see server_jax
            # ._scan_fold_batched_impl / _map_queries: a full-NQ fold's
            # temporaries OOM'd next to a multi-GB local DB shard)
            v_negs = sj.get_v_folding_neg(params, v_foldings,
                                          self.gadget_ntt_u32)
            part = full.reshape(full.shape[:5] + (nq, 2))
            cts = jnp.transpose(part, (5, 2, 3, 4, 6, 0, 1))
            cts = cts.reshape(nq, inst * t_local, num_per, 2, 1,
                              params.crt_count, params.poly_len)

            def fold_one(args):
                ct_q, v_fold, v_neg = args
                hi, lo = sj.from_ntt(params, ct_q)
                return sj.fold_ciphertexts(params, hi, lo, v_fold, v_neg)

            h, l = jax.lax.map(fold_one, (cts, v_foldings, v_negs),
                               batch_size=min(4, nq))
            shape = (nq, inst, t_local) + h.shape[2:]
            return h.reshape(shape), l.reshape(shape)

        self.scan_fold_batched = jax.jit(scan_fold_batched)

    def shard_db(self, db):
        """Place the dense DB arrays onto the mesh with the scan sharding
        (dim0 over "db", trials over "dp" — either dense layout)."""
        if db[0].ndim == 6:
            spec = P(None, None, "dp", None, None, "db")
        else:
            spec = P(None, None, "dp", None, "db")
        sh = jax.sharding.NamedSharding(self.mesh, spec)
        return tuple(jax.device_put(p, sh) for p in db)


class DoublePirShardedScan:
    """DoublePIR online scan over a row-sharded DB.

    The first-level matvec DB_rows x q1 dominates the answer; rows shard
    over the mesh's "db" axis (every device scans its chunk — the reference
    chunk-and-sum pattern, bin/e2e.rs:60-106, with the response gather as
    the collective). All arithmetic is mod 2^32 so partial rows concatenate
    without any reduction.
    """

    def __init__(self, mesh: Mesh):
        from ..doublepir.jax_kernels import mat_mul_vec_packed_traced

        self.mesh = mesh
        axis = "db"

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis, None), P(None, None)),
            out_specs=P(axis, None), check_rep=False)
        def scan(db_rows, q_wide):
            return mat_mul_vec_packed_traced(db_rows, q_wide)

        self.scan = jax.jit(scan)

    def shard_rows(self, db_packed):
        n = self.mesh.shape["db"]
        rows = db_packed.shape[0]
        pad = (-rows) % n
        if pad:
            db_packed = np.vstack(
                [db_packed, np.zeros((pad, db_packed.shape[1]),
                                     dtype=db_packed.dtype)])
        return jax.device_put(
            jnp.asarray(db_packed),
            jax.sharding.NamedSharding(self.mesh, P("db", None)))

    def answer_firstlevel(self, db_sharded, queries_q1: list[np.ndarray],
                          total_rows: int) -> np.ndarray:
        """queries_q1: one (m3, 1) u32 column per row-batch. Returns the
        concatenated a_1 (total_rows, 1), selecting each row's own batch
        column (semantics of scheme.answer's per-batch loop)."""
        q_wide = jnp.asarray(np.concatenate(queries_q1, axis=1))
        full = np.asarray(self.scan(db_sharded, q_wide))[:total_rows]
        nq = len(queries_q1)
        batch_sz = total_rows // nq
        batch_of_row = np.minimum(np.arange(total_rows) // batch_sz, nq - 1)
        return np.take_along_axis(full, batch_of_row[:, None], axis=1)

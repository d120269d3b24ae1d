"""TPU Spiral server: device state + the jit-compiled query pipeline.

Host glue (wire formats, rescale/bit-pack encode) stays in numpy; everything
between query deserialization and response encoding runs as one traced JAX
program (expansion -> first-dim MXU matvec -> fold -> pack).

Reference pipeline: lib/server/src/server.rs:17-99 (process_query) and
lib/spiral-rs/src/server.rs:650-741.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import poly as hpoly
from ..arith import rescale_arr
from ..bitpack import write_fields
from ..client import PublicParameters, Query
from ..params import Params, Q2_VALUES
from ..arith import log2_ceil
from . import spiral_jax as sj
from .modops import U32

U64 = np.uint64


def _split_pair_np(a: np.ndarray):
    """u64 numpy -> (hi, lo) u32 numpy."""
    return (a >> U64(32)).astype(np.uint32), a.astype(np.uint32)


def _join_pair_np(hi: np.ndarray, lo: np.ndarray):
    return (hi.astype(U64) << U64(32)) | lo.astype(U64)


def db_tensor_to_device(params: Params, db_host: np.ndarray,
                        layout: str = "latency", sharded: bool = False):
    """Host DB tensor (inst, trials, poly_len, crt, num_per, dim0) u64 ->
    device int8 limb storage in one of two DENSE layouts (both the same
    total bytes; both scans bit-exact — sj.firstdim_multiply dispatches on
    array rank):

    - "latency" (default): a tuple of crt*NUM_LIMBS SEPARATE plane arrays,
      each (z, inst, trials, num_per, dim0); plane c*NUM_LIMBS+k = limb k
      of CRT channel c. Fastest single-query scan (13.5 ms on the 8.6 GB
      index); separate arrays because slicing planes out of one stacked
      device tensor made XLA re-copy the plane per scan.
    - "throughput": a tuple of crt channel arrays
      (z, inst, trials, num_per, NUM_LIMBS*dim0) — the limb-CONCATENATED
      row layout (limb k of column j at minor position k*dim0+j). The
      batched scan runs as ONE weight-grouped GEMM per channel
      (sj._firstdim_multiply_kconcat): 1.6x faster at the 16-query batch
      (49.4 -> 30.3 ms), ~10% slower single-query. The (L, dim0) pair is
      merged HOST-side: a device-side reshape that merges the minor dims
      is NOT free under TPU tiling — it materialized a full 4 GB copy of
      the 1 GiB index as an HLO temp and OOM'd HBM at the 16-query batch
      (the scan's other reshape, (a,t,npr)->M over non-minor dims, IS
      free — same as the latency path's). Pass sharded=True to get the
      6-D (..., NUM_LIMBS, dim0) form instead: the sharded scan needs
      dim0 as a real axis to shard over "db" (ops/shard.py), and its
      per-device local reshape copies only a shard-sized temp.

    The limb decompose happens host-side so only the final int8 arrays
    (same total bytes as the u32 residues) are resident in HBM — a
    device-side decompose would briefly double the multi-GB index."""
    # (crt, z, inst, trials, num_per, dim0) u32
    u32 = np.ascontiguousarray(
        db_host.transpose(3, 2, 0, 1, 4, 5)).astype(np.uint32)
    if layout == "throughput":
        def chan(c):
            arr = np.stack(
                [((u32[c] >> np.uint32(sj.LIMB_BITS * k))
                  & np.uint32(127)).astype(np.int8)
                 for k in range(sj.NUM_LIMBS)], axis=-2)
            if not sharded:   # merge (L, dim0) host-side (free; see above)
                arr = arr.reshape(arr.shape[:-2] + (-1,))
            return jnp.asarray(arr)

        return tuple(chan(c) for c in range(params.crt_count))
    assert layout == "latency", layout
    return tuple(
        jnp.asarray(((u32[c] >> np.uint32(sj.LIMB_BITS * k))
                     & np.uint32(127)).astype(np.int8))
        for c in range(params.crt_count) for k in range(sj.NUM_LIMBS))


def db_zeros_device(params: Params, layout: str = "latency",
                    sharded: bool = False):
    """Empty device DB in the given dense storage layout
    (see db_tensor_to_device)."""
    dim0 = 1 << params.db_dim_1
    num_per = 1 << params.db_dim_2
    base = (params.poly_len, params.instances, params.n * params.n, num_per)
    if layout == "throughput":
        tail = (sj.NUM_LIMBS, dim0) if sharded else (sj.NUM_LIMBS * dim0,)
        return tuple(jnp.zeros(base + tail, dtype=jnp.int8)
                     for _ in range(params.crt_count))
    assert layout == "latency", layout
    return tuple(jnp.zeros(base + (dim0,), dtype=jnp.int8)
                 for _ in range(params.crt_count * sj.NUM_LIMBS))


def index_hbm_bytes(params: Params) -> int:
    """Device bytes of the dense encrypted index (identical in both dense
    layouts: crt*NUM_LIMBS int8 entries per u64 coefficient pair)."""
    dim0 = 1 << params.db_dim_1
    num_per = 1 << params.db_dim_2
    return (params.crt_count * sj.NUM_LIMBS * params.poly_len
            * params.instances * params.n * params.n * num_per * dim0)


def serving_working_set_bytes(params: Params, nq: int = 16,
                              chunk: int = 4) -> int:
    """Estimated peak serving temporaries NEXT TO the dense index for an
    nq-query fused batch with chunk-mapped per-query stages: the shared
    scan intermediate (crt, z, inst, trials, num_per, 2*nq) u32, the nq
    flat query carriers, and `chunk` queries' expansion + fold temps.
    Multipliers calibrated against the round-4 measurements at the 1 GiB
    shape (expansion ~16x its flat carrier from scatter/select temps,
    fold ~8x its round-0 digit matrix); the total reproduces the ~12 GB
    peak that fit next to the 8.6 GB index after batch chunking (the
    un-chunked form needed 21.07 GB and OOM'd — server_jax._map_queries)."""
    crt, z = params.crt_count, params.poly_len
    inst, trials = params.instances, params.n * params.n
    dim0 = 1 << params.db_dim_1
    num_per = 1 << params.db_dim_2
    inter = crt * z * inst * trials * num_per * 2 * nq * 4
    q_flats = nq * crt * z * 2 * dim0 * 4
    expand = 16 * crt * z * 2 * dim0 * 4
    fold = 8 * num_per * 2 * params.t_gsw * crt * z * 4
    return inter + q_flats + chunk * (expand + fold)


def pp_to_device(params: Params, pp: PublicParameters) -> dict:
    """Stack public-parameter matrices into device uint32 arrays, paired
    with host-precomputed Shoup companions (session-fixed key material)."""
    def keyed(m: np.ndarray):
        return (jnp.asarray(m.astype(np.uint32)),
                jnp.asarray(sj.shoup_companion_arr(params, m)))

    out = {"v_packing": [keyed(m) for m in pp.v_packing]}
    if params.expand_queries:
        out["v_exp_left"] = [keyed(m) for m in pp.v_expansion_left]
        right = pp.v_expansion_right or pp.v_expansion_left
        out["v_exp_right"] = [keyed(m) for m in right]
        out["v_conversion"] = keyed(pp.v_conversion[0])
    return out


class SpiralServerJax:
    """Device-resident Spiral server for one parameter set.

    Pass a jax.sharding.Mesh (axes "dp", "db") to serve from a sharded DB:
    first-dim rows split over the "db" axis with exact mod-q psum
    partial-response reduction, instances*trials over "dp"
    (sdk_tpu.ops.shard)."""

    def __init__(self, params: Params, mesh=None,
                 dense_layout: str = "latency"):
        assert dense_layout in ("latency", "throughput"), dense_layout
        self.params = params
        # dense DB storage profile (see db_tensor_to_device): "latency" =
        # separate limb planes (fastest single query), "throughput" =
        # limb-concat channels (1.6x faster batched scans)
        self.dense_layout = dense_layout
        self.plan = sj.ExpansionPlan(params) if params.expand_queries else None
        self._splan = None
        self._splan_dev = None
        g = hpoly.to_ntt(params, hpoly.build_gadget(params, 2, 2 * params.t_gsw))
        self.gadget_ntt_u32 = g.astype(np.uint32)
        self.db = None
        self.mesh = mesh
        from .encode_jax import ResponseEncodePlan

        self._encode_plan = ResponseEncodePlan(params)
        # pad batched reads to power-of-two NQ (bounds jit retraces to
        # log2(NQ_max) programs; see dispatch_queries_batched)
        self.batch_pad_pow2 = True
        # stacked per-client key material, cached by the identity of the
        # pp_dev dicts in the (padded) batch: serving batches repeat the
        # same session set, and re-stacking ~100 key leaves enqueued ~200 ms
        # of host dispatch per batch at NQ=16 (tools/profile_batch16.py,
        # round 5). Entries pin their pp dicts (strong refs) so a dict id
        # can't be reused while its cache line is alive. BYTE-capped LRU:
        # each line holds a full NQ-wide device copy of the key material,
        # and the cap is what the server's HBM capacity guard budgets
        # (stack_cache_budget_bytes). The MRU line survives even if it
        # alone exceeds the cap (otherwise batch serving would lose the
        # ~200 ms/batch win entirely).
        self._stack_cache: dict = {}
        self._stack_cache_max_bytes = 512 << 20
        # per-query stages of the fused batched read (expansion, fold,
        # pack+encode) run in lax.map chunks of this size — bounds peak
        # HBM to chunk x per-query temporaries next to a multi-GB index
        # (see _map_queries)
        self.batch_chunk = 4
        self._jit_expand = jax.jit(self._expand_impl)
        if mesh is not None:
            from .shard import ShardedSpiralScan

            self._sharded = ShardedSpiralScan(params, mesh,
                                              self.gadget_ntt_u32,
                                              dense_layout)
            self._jit_scan_fold = self._sharded.scan_fold
        else:
            self._sharded = None
            self._jit_scan_fold = jax.jit(self._scan_fold_impl)
        self._jit_pack = jax.jit(self._pack_impl)

    # -- state --

    def stack_cache_budget_bytes(self) -> int:
        """Worst-case device bytes the stacked-key LRU may pin (its byte
        cap, or the current MRU entry when that alone exceeds the cap) —
        budgeted by the server's HBM capacity guard."""
        cur = max((e[2] for e in self._stack_cache.values()), default=0)
        return max(self._stack_cache_max_bytes, cur)

    def set_db_from_items(self, items: np.ndarray):
        """items: (instances, trials, num_items, poly_len) mod-p uint64."""
        from ..server_host import build_db_tensor

        self.set_db_host_tensor(build_db_tensor(self.params, items))

    def set_db_host_tensor(self, db_host: np.ndarray):
        self.db = db_tensor_to_device(self.params, db_host,
                                      self.dense_layout,
                                      sharded=self._sharded is not None)
        if self._sharded is not None:
            self.db = self._sharded.shard_db(self.db)

    def set_populated_dim0(self, populated) -> None:
        """Enable compacted sparse query expansion: only the ciphertexts
        whose first-dim DB indices appear in `populated` are expanded
        (reference per-round skip sets, query_expansion.rs:213-248, rebuilt
        as a gather-compacted schedule — see sj.SparseExpansionPlan).
        Pass None (or a full set) to restore dense expansion."""
        params = self.params
        if populated is None or not params.expand_queries:
            self._splan = self._splan_dev = None
            return
        pop = sorted({int(i) for i in populated})
        dim0 = 1 << params.db_dim_1
        if not pop or len(pop) == dim0:
            self._splan = self._splan_dev = None
            return
        right = params.t_gsw * params.db_dim_2
        self._splan = sj.SparseExpansionPlan(params, pop, right)
        self._splan_dev = self._splan.device_args()
        if not hasattr(self, "_jit_expand_sparse"):
            self._jit_expand_sparse = jax.jit(self._expand_sparse_impl)

    # -- traced stages --

    def _expand_impl(self, ct0_hi, ct0_lo, v_exp_left, v_exp_right, v_conv):
        params = self.params
        ct0 = sj.to_ntt(params, ct0_hi, ct0_lo)          # (2, 1, crt, n)
        right_expanded = params.t_gsw * params.db_dim_2
        cts = sj.coefficient_expansion(params, self.plan, ct0, v_exp_left,
                                       v_exp_right, right_expanded)
        dim0 = 1 << params.db_dim_1
        if params.db_dim_2 > 0:
            v_reg = cts[0::2][:dim0]
            v_gsw_inp = cts[1::2][:right_expanded]
            v_folding = sj.regev_to_gsw(params, v_gsw_inp, v_conv)
        else:
            v_reg = cts[:dim0]
            v_folding = jnp.zeros(
                (0, 2, 2 * params.t_gsw, params.crt_count, params.poly_len),
                dtype=U32)
        # firstdim layout: (crt, poly_len, dim0, 2)
        q_arr = jnp.transpose(v_reg[:, :, 0], (2, 3, 0, 1))
        return q_arr, v_folding

    def _expand_sparse_impl(self, ct0_hi, ct0_lo, v_exp_left, v_exp_right,
                            v_conv, *sched_args):
        params = self.params
        ct0 = sj.to_ntt(params, ct0_hi, ct0_lo)
        leaves, even_leaf_pos, even_dim0_idx, odd_leaf_pos = \
            sj.coefficient_expansion_sparse(params, self.plan, self._splan,
                                            ct0, v_exp_left, v_exp_right,
                                            sched_args)
        dim0 = 1 << params.db_dim_1
        v_reg = jnp.take(leaves, even_leaf_pos, axis=0)   # (P, 2, 1, crt, n)
        vals = jnp.transpose(v_reg[:, :, 0], (2, 3, 0, 1))  # (crt, n, P, 2)
        q_arr = jnp.zeros((params.crt_count, params.poly_len, dim0, 2),
                          dtype=U32)
        # padded scatter indices equal dim0 (out of bounds) and drop;
        # unpopulated columns stay zero, which the zero DB rows ignore
        q_arr = q_arr.at[:, :, even_dim0_idx, :].set(vals, mode="drop")
        if params.db_dim_2 > 0:
            v_gsw_inp = jnp.take(leaves, odd_leaf_pos, axis=0)
            v_folding = sj.regev_to_gsw(params, v_gsw_inp, v_conv)
        else:
            v_folding = jnp.zeros(
                (0, 2, 2 * params.t_gsw, params.crt_count, params.poly_len),
                dtype=U32)
        return q_arr, v_folding

    # -- pad-free flat query carriers (batched fused path) --
    #
    # The single-query layout (crt, z, dim0, 2) pads its minor dim 2 -> 128
    # lanes under the TPU T(8,128) tiling (64x); vmapped over a 16-query
    # batch at the 1 GiB shape the expansion scatter materialized a 16 GB
    # padded temp and OOM'd the chip. The batched path therefore carries
    # each query as a FLAT (crt, z, 2*dim0) array (row r of the ct at
    # columns [r*dim0, (r+1)*dim0)) — minor dim 2*dim0, no padding — and
    # scans via sj.firstdim_multiply_qT. Bit-identical throughout.

    def _expand_flat_impl(self, ct0_hi, ct0_lo, v_exp_left, v_exp_right,
                          v_conv):
        params = self.params
        ct0 = sj.to_ntt(params, ct0_hi, ct0_lo)
        right_expanded = params.t_gsw * params.db_dim_2
        cts = sj.coefficient_expansion(params, self.plan, ct0, v_exp_left,
                                       v_exp_right, right_expanded)
        dim0 = 1 << params.db_dim_1
        if params.db_dim_2 > 0:
            v_reg = cts[0::2][:dim0]
            v_folding = sj.regev_to_gsw(
                params, cts[1::2][:right_expanded], v_conv)
        else:
            v_reg = cts[:dim0]
            v_folding = jnp.zeros(
                (0, 2, 2 * params.t_gsw, params.crt_count, params.poly_len),
                dtype=U32)
        # v_reg: (dim0, 2, 1, crt, z) -> per-row (crt, z, dim0) planes,
        # concatenated to the flat (crt, z, 2*dim0) carrier
        q_flat = jnp.concatenate(
            [jnp.transpose(v_reg[:, r, 0], (1, 2, 0)) for r in (0, 1)],
            axis=-1)
        return q_flat, v_folding

    def _expand_sparse_flat_impl(self, ct0_hi, ct0_lo, v_exp_left,
                                 v_exp_right, v_conv, *sched_args):
        params = self.params
        ct0 = sj.to_ntt(params, ct0_hi, ct0_lo)
        leaves, even_leaf_pos, even_dim0_idx, odd_leaf_pos = \
            sj.coefficient_expansion_sparse(params, self.plan, self._splan,
                                            ct0, v_exp_left, v_exp_right,
                                            sched_args)
        dim0 = 1 << params.db_dim_1
        v_reg = jnp.take(leaves, even_leaf_pos, axis=0)   # (P, 2, 1, crt, n)
        # per-row value planes (crt, z, P) — all pad-free minors
        vals = [jnp.transpose(v_reg[:, r, 0], (1, 2, 0)) for r in (0, 1)]
        vals2 = jnp.concatenate(vals, axis=-1)            # (crt, z, 2P)
        # the plan pads unused slots with index == dim0; in the flat carrier
        # that lands on row-1 column 0, so remap row-0 pads out of bounds
        idx0 = jnp.where(even_dim0_idx >= dim0, 2 * dim0, even_dim0_idx)
        idx1 = even_dim0_idx + dim0                       # pads -> 2*dim0 OOB
        idx2 = jnp.concatenate([idx0, idx1])
        q_flat = jnp.zeros((params.crt_count, params.poly_len, 2 * dim0),
                           dtype=U32)
        q_flat = q_flat.at[:, :, idx2].set(vals2, mode="drop")
        if params.db_dim_2 > 0:
            v_gsw_inp = jnp.take(leaves, odd_leaf_pos, axis=0)
            v_folding = sj.regev_to_gsw(params, v_gsw_inp, v_conv)
        else:
            v_folding = jnp.zeros(
                (0, 2, 2 * params.t_gsw, params.crt_count, params.poly_len),
                dtype=U32)
        return q_flat, v_folding

    def _scan_fold_impl(self, db, q_arr, v_folding):
        """db: tuple of crt*L limb planes (z, inst, trials, num_per, dim0)
        int8. Returns folded raw cts (inst, trials, 2, 1, poly_len) pairs."""
        params = self.params
        v_folding_neg = sj.get_v_folding_neg(params, v_folding,
                                             self.gadget_ntt_u32)
        inter = sj.firstdim_multiply(params, db, q_arr)
        # (crt, z, inst, trials, num_per, 2) -> (IT, num_per, 2, 1, crt, z)
        cts = jnp.transpose(inter, (2, 3, 4, 5, 0, 1))
        inst, trials = cts.shape[:2]
        cts = cts.reshape((inst * trials,) + cts.shape[2:])[:, :, :, None, :, :]
        hi, lo = sj.from_ntt(params, cts)
        h, l = sj.fold_ciphertexts(params, hi, lo, v_folding,
                                   v_folding_neg)
        shape = (inst, trials) + h.shape[1:]
        return h.reshape(shape), l.reshape(shape)

    def _pack_impl(self, folded_hi, folded_lo, v_packing):
        """folded: (inst, trials, 2, 1, n) pairs -> packed raw
        (inst, n+1, n, poly_len) pairs. v_packing: list of keyed matrices."""
        params = self.params
        outs_h, outs_l = [], []
        for inst in range(params.instances):
            packed = sj.pack(params, folded_hi[inst], folded_lo[inst],
                             v_packing)
            h, l = sj.from_ntt(params, packed)
            outs_h.append(h)
            outs_l.append(l)
        return jnp.stack(outs_h), jnp.stack(outs_l)

    def _pack_encode_impl(self, folded_hi, folded_lo, v_packing):
        """pack + on-device rescale/bit-pack encode: returns the wire
        response as u32 words (little-endian bytes) so only ~num_bytes
        leave the device instead of the raw packed ct pairs."""
        p_hi, p_lo = self._pack_impl(folded_hi, folded_lo, v_packing)
        return self._encode_plan.encode(p_hi, p_lo)

    # -- host orchestration --

    def expand_query(self, pp_dev: dict, query: Query):
        params = self.params
        ct_hi, ct_lo = _split_pair_np(query.ct)
        if self._splan is not None:
            return self._jit_expand_sparse(
                jnp.asarray(ct_hi), jnp.asarray(ct_lo),
                pp_dev["v_exp_left"], pp_dev["v_exp_right"],
                pp_dev["v_conversion"], *self._splan_dev)
        q_arr, v_folding = self._jit_expand(
            jnp.asarray(ct_hi), jnp.asarray(ct_lo),
            pp_dev["v_exp_left"], pp_dev["v_exp_right"], pp_dev["v_conversion"])
        return q_arr, v_folding

    def query_to_device(self, pp_dev: dict, query: Query):
        """Returns (q_arr, v_folding) device arrays for either query kind."""
        params = self.params
        if params.expand_queries:
            return self.expand_query(pp_dev, query)
        # direct-upload: unpack the reoriented buffer [z][j][r] packed u64
        dim0 = 1 << params.db_dim_1
        buf = query.v_buf.reshape(params.poly_len, dim0, 2)
        q0 = (buf & U64(0xFFFFFFFF)).astype(np.uint32)
        q1 = (buf >> U64(32)).astype(np.uint32)
        # buf axes are (z, j, r) — target (crt, z, dim0, 2)
        q_arr = jnp.asarray(np.stack([q0, q1]))
        v_ct = np.stack(query.v_ct)                  # (dim2, 2, 2*t_gsw, n) u64
        hi, lo = _split_pair_np(v_ct)
        v_folding = jax.jit(functools.partial(sj.to_ntt, params))(
            jnp.asarray(hi), jnp.asarray(lo))
        return q_arr, v_folding

    def _full_impl(self, db, ct0_hi, ct0_lo, v_exp_left, v_exp_right, v_conv,
                   v_packing):
        """Whole query pipeline as ONE traced program (single dispatch),
        returning the wire response as u32 words (device-side encode)."""
        q_arr, v_folding = self._expand_impl(ct0_hi, ct0_lo, v_exp_left,
                                             v_exp_right, v_conv)
        f_hi, f_lo = self._scan_fold_impl(db, q_arr, v_folding)
        return self._pack_encode_impl(f_hi, f_lo, v_packing)

    def _full_sparse_impl(self, db, ct0_hi, ct0_lo, v_exp_left, v_exp_right,
                          v_conv, v_packing, *sched_args):
        """Single-dispatch pipeline with compacted sparse expansion (the
        staged split costs extra dispatch round trips per query)."""
        q_arr, v_folding = self._expand_sparse_impl(
            ct0_hi, ct0_lo, v_exp_left, v_exp_right, v_conv, *sched_args)
        f_hi, f_lo = self._scan_fold_impl(db, q_arr, v_folding)
        return self._pack_encode_impl(f_hi, f_lo, v_packing)

    def _map_queries(self, fn, *xs):
        """Apply a per-query stage across the batch in CHUNKS of
        self.batch_chunk (lax.map batch_size = vmap over each chunk inside
        one traced while-loop body). vmapping a full 16-query batch
        materialized every query's stage temporaries at once and OOM'd the
        chip next to the 8.6 GB index (21.07 G needed vs 15.75 G HBM, round
        4): expansion alone carries ~0.24 GB of scatter/select temps per
        query at the 1 GiB-bucket shape and the fold's round-0 key matmul
        ~0.13 GB. Chunking bounds the peak to chunk x per-query while
        keeping ONE dispatch and ONE traced body (compile cost ~= a
        chunk-sized vmap, not NQ unrolled programs)."""
        nq = jax.tree.leaves(xs[0])[0].shape[0]
        return jax.lax.map(lambda a: fn(*a), xs,
                           batch_size=min(self.batch_chunk, nq))

    def _full_batched_impl(self, db, ct_hi_b, ct_lo_b, v_exp_left,
                           v_exp_right, v_conv, v_packing):
        """The whole BATCH as one traced program: chunk-mapped expansion
        over stacked per-client keys, ONE shared DB scan (2*NQ MXU
        columns), chunk-mapped per-query folds and pack+encode. A batch of
        any size is a single dispatch and a single wire-words fetch."""
        q_flats, v_folds = self._map_queries(
            self._expand_flat_impl, ct_hi_b, ct_lo_b, v_exp_left,
            v_exp_right, v_conv)
        f_hi, f_lo = self._scan_fold_batched_impl(db, q_flats, v_folds)
        return self._map_queries(self._pack_encode_impl, f_hi, f_lo,
                                 v_packing)

    def _full_batched_sparse_impl(self, db, ct_hi_b, ct_lo_b, v_exp_left,
                                  v_exp_right, v_conv, v_packing,
                                  *sched_args):
        def expand(h, l, a, b, c):
            return self._expand_sparse_flat_impl(h, l, a, b, c, *sched_args)

        q_flats, v_folds = self._map_queries(expand, ct_hi_b, ct_lo_b,
                                             v_exp_left, v_exp_right, v_conv)
        f_hi, f_lo = self._scan_fold_batched_impl(db, q_flats, v_folds)
        return self._map_queries(self._pack_encode_impl, f_hi, f_lo,
                                 v_packing)

    def _full_batched_sharded_impl(self, db, ct_hi_b, ct_lo_b, v_exp_left,
                                   v_exp_right, v_conv, v_packing,
                                   *sched_args):
        """Sharded fused batch: expansion chunk-maps replicated, the scan
        runs as the shard_map'd DB pass (exact mod-q psum over "db"), pack
        and encode chunk-map over the gathered fold outputs — still one
        dispatch (see _map_queries for the chunking rationale)."""
        if sched_args:
            def expand(h, l, a, b, c):
                return self._expand_sparse_impl(h, l, a, b, c, *sched_args)
        else:
            expand = self._expand_impl
        q_arrs, v_folds = self._map_queries(expand, ct_hi_b, ct_lo_b,
                                            v_exp_left, v_exp_right, v_conv)
        f_hi, f_lo = self._sharded.scan_fold_batched(db, q_arrs, v_folds)
        return self._map_queries(self._pack_encode_impl, f_hi, f_lo,
                                 v_packing)

    def _dispatch_fused(self, pp_dev: dict, query: Query):
        """Async-dispatch the fused single-query program (sparse-expansion
        variant when a populated set is installed); returns the device
        words array without blocking."""
        ct_hi, ct_lo = _split_pair_np(query.ct)
        if self._splan is not None:
            if not hasattr(self, "_jit_full_sparse"):
                self._jit_full_sparse = jax.jit(self._full_sparse_impl)
            return self._jit_full_sparse(
                self.db, jnp.asarray(ct_hi), jnp.asarray(ct_lo),
                pp_dev["v_exp_left"], pp_dev["v_exp_right"],
                pp_dev["v_conversion"], pp_dev["v_packing"],
                *self._splan_dev)
        if not hasattr(self, "_jit_full"):
            self._jit_full = jax.jit(self._full_impl)
        return self._jit_full(
            self.db, jnp.asarray(ct_hi), jnp.asarray(ct_lo),
            pp_dev["v_exp_left"], pp_dev["v_exp_right"],
            pp_dev["v_conversion"], pp_dev["v_packing"])

    def process_query(self, pp: PublicParameters | dict, query: Query) -> bytes:
        from ..telemetry import GLOBAL_TIMERS as T
        from ..debug_hooks import check_folded_ct, client_test_active

        params = self.params
        pp_dev = pp if isinstance(pp, dict) else pp_to_device(params, pp)
        if (params.expand_queries and self._sharded is None
                and not client_test_active()):
            # fused single-dispatch path (sparse-expansion variant when a
            # populated set is installed)
            with T.stage("query_fused"):
                words = self._dispatch_fused(pp_dev, query)
                return self._encode_plan.to_bytes(words)
        with T.stage("expand"):
            q_arr, v_folding = self.query_to_device(pp_dev, query)
        with T.stage("scan_fold"):
            f_hi, f_lo = self._jit_scan_fold(self.db, q_arr, v_folding)
            f_hi.block_until_ready()
        if client_test_active():
            # decrypt the instance-0/trial-0 folded ct mid-pipeline to
            # localize noise failures (reference server.rs:713-729)
            ct = _join_pair_np(np.asarray(f_hi[0, 0]), np.asarray(f_lo[0, 0]))
            check_folded_ct(params, ct)
        with T.stage("pack_encode"):
            if not hasattr(self, "_jit_pack_encode"):
                self._jit_pack_encode = jax.jit(self._pack_encode_impl)
            words = self._jit_pack_encode(f_hi, f_lo, pp_dev["v_packing"])
            return self._encode_plan.to_bytes(words)

    # -- batched serving: amortize one DB pass over many queries --

    def _scan_fold_batched_impl(self, db, q_flats, v_foldings):
        """q_flats: (NQ, crt, z, 2*dim0) pad-free flat carriers (row r of
        query i at columns [r*dim0, (r+1)*dim0)); v_foldings:
        (NQ, dim2, 2, 2t, crt, z). One DB scan with 2*NQ result columns
        fills the MXU (the reference's query-batching pattern, SURVEY 2.8);
        folds run per query."""
        params = self.params
        nq, crt, z = q_flats.shape[:3]
        dim0 = q_flats.shape[-1] // 2
        # (crt, z, NQ, 2*dim0) -> (crt, z, 2*NQ, dim0): column order
        # [2*i + r], identical to the old per-query concat along R
        q_t = jnp.transpose(q_flats, (1, 2, 0, 3)).reshape(
            crt, z, 2 * nq, dim0)
        inter = sj.firstdim_multiply_qT(params, db, q_t)
        # (crt, z, inst, trials, num_per, 2*NQ)
        inst, trials = inter.shape[2], inter.shape[3]
        num_per = inter.shape[4]
        # Queries fold in CHUNKS of batch_chunk (lax.map batch_size):
        # within a chunk each round is ONE digit NTT + ONE matmul + ONE
        # iNTT via fold_ciphertexts' per-query batch dims. Measured at
        # NQ=16 on v5e (tools/profile_fold.py --batch): the fold is
        # VPU-bound and linear in NQ (the all-at-once batch only tied the
        # per-query loop, 583 vs 587 ms steady-state), so chunking costs
        # nothing — while a full-NQ fold's temporaries next to the 8.6 GB
        # index OOM'd the chip, and NQ unrolled per-query folds compiled
        # 750 s vs the chunk body's ~38 s.
        v_negs = sj.get_v_folding_neg(params, v_foldings,
                                      self.gadget_ntt_u32)
        part = inter.reshape(inter.shape[:5] + (nq, 2))
        cts = jnp.transpose(part, (5, 2, 3, 4, 6, 0, 1))
        cts = cts.reshape(nq, inst * trials, num_per, 2, 1, crt, z)

        def fold_one(ct_q, v_fold, v_neg):
            hi, lo = sj.from_ntt(params, ct_q)
            return sj.fold_ciphertexts(params, hi, lo, v_fold, v_neg)

        h, l = self._map_queries(fold_one, cts, v_foldings, v_negs)
        shape = (nq, inst, trials) + h.shape[2:]
        return h.reshape(shape), l.reshape(shape)

    def process_queries_batched(self, requests: list) -> list[bytes]:
        """requests: list of (pp_dev_or_pp, query). One fused DB scan."""
        return self.dispatch_queries_batched(requests)()

    def dispatch_queries_batched(self, requests: list):
        """Two-phase batched serving: async-dispatch everything on device
        and return a zero-arg fetch function that blocks on the transfers
        and returns the response bytes.

        Dispatch must run while holding the server's write lock — a
        concurrent flush DONATES the DB buffer (kv/ingest._jit_scatter),
        and a dispatch racing that donation would read a deleted array.
        The fetch may run OUTSIDE the lock: JAX arrays are immutable and
        the runtime keeps donated buffers alive for in-flight programs, so
        writes proceed while the device crunches the batch (the win over
        the reference's RwLock, which pins writers out for the whole
        query; lib/server/src/bin/server.rs read path)."""
        from ..debug_hooks import client_test_active

        params = self.params
        if len(requests) == 1:
            pp, query = requests[0]
            if (params.expand_queries and self._sharded is None
                    and not client_test_active()):
                pp_dev = pp if isinstance(pp, dict) \
                    else pp_to_device(params, pp)
                words = self._dispatch_fused(pp_dev, query)
                return lambda: [self._encode_plan.to_bytes(words)]
            # staged / sharded / CLIENT_TEST paths block internally
            res = [self.process_query(pp, query)]
            return lambda: res

        # Bound the retrace surface: each distinct batch size NQ compiles
        # (and persists) its own program, and cold compiles run minutes on
        # this stack — a live mix of arbitrary batch sizes would stall on
        # every new NQ. Pad to the next power of two with repeats of
        # request 0 (the DoublePIR reference plants random filler indices
        # the same way, client.rs:174-213); filler responses are sliced
        # off before returning. At most log2(NQ_max) programs ever compile.
        n_real = len(requests)
        if self.batch_pad_pow2:
            pad_n = 1 << (n_real - 1).bit_length()
            if pad_n != n_real:
                requests = list(requests) + [requests[0]] * (pad_n - n_real)

        def stack_key(pps, key):
            return jax.tree.map(lambda *xs: jnp.stack(xs),
                                *[pp[key] for pp in pps])

        if params.expand_queries and not client_test_active():
            # one dispatch for the whole batch: expansion, scan, folds,
            # pack and encode fused (per-client key material stacked —
            # identical clients repeat their keys; acceptable at serving
            # batch sizes, the index dwarfs them)
            pps = [pp if isinstance(pp, dict) else pp_to_device(params, pp)
                   for pp, _ in requests]
            hs, ls = zip(*[_split_pair_np(q.ct) for _, q in requests])
            ct_hi_b = jnp.asarray(np.stack(hs))
            ct_lo_b = jnp.asarray(np.stack(ls))
            # cache only dict-keyed batches: pp dicts are the stable
            # session objects (kv_server.pub_params); PublicParameters
            # inputs get a fresh device dict per call, so their ids never
            # repeat and caching would only pin dead memory
            cacheable = all(isinstance(pp, dict) for pp, _ in requests)
            ck = tuple(map(id, pps))
            hit = self._stack_cache.pop(ck, None) if cacheable else None
            if hit is None:
                stacked = tuple(stack_key(pps, k) for k in
                                ("v_exp_left", "v_exp_right", "v_conversion",
                                 "v_packing"))
                nbytes = sum(x.nbytes for x in jax.tree.leaves(stacked))
                hit = (pps, stacked, nbytes)  # pps pins the dict ids
            else:
                stacked = hit[1]
            if cacheable:
                self._stack_cache[ck] = hit   # re-insert = move to MRU
                while (len(self._stack_cache) > 1
                       and sum(e[2] for e in self._stack_cache.values())
                       > self._stack_cache_max_bytes):
                    self._stack_cache.pop(next(iter(self._stack_cache)))
            sched = self._splan_dev if self._splan is not None else ()
            if self._sharded is not None:
                if not hasattr(self, "_jit_full_b_sharded"):
                    self._jit_full_b_sharded = jax.jit(
                        self._full_batched_sharded_impl)
                words_all = self._jit_full_b_sharded(
                    self.db, ct_hi_b, ct_lo_b, *stacked, *sched)
            elif self._splan is not None:
                if not hasattr(self, "_jit_full_b_sparse"):
                    self._jit_full_b_sparse = jax.jit(
                        self._full_batched_sparse_impl)
                words_all = self._jit_full_b_sparse(
                    self.db, ct_hi_b, ct_lo_b, *stacked, *sched)
            else:
                if not hasattr(self, "_jit_full_b"):
                    self._jit_full_b = jax.jit(self._full_batched_impl)
                words_all = self._jit_full_b(self.db, ct_hi_b, ct_lo_b,
                                             *stacked)

            def fetch():
                host = np.asarray(words_all)   # one device->host transfer
                return [self._encode_plan.to_bytes(host[i])
                        for i in range(n_real)]

            return fetch
        sharded = self._sharded is not None
        if not sharded and not hasattr(self, "_jit_q_flat"):
            # (crt, z, dim0, 2) -> pad-free (crt, z, 2*dim0); its own tiny
            # dispatch so each padded per-query buffer is released before
            # the next query's lands (16 padded carriers alone exceed HBM
            # at the 1 GiB shape)
            self._jit_q_flat = jax.jit(lambda qa: jnp.concatenate(
                [qa[..., 0], qa[..., 1]], axis=-1))
        q_arrs, v_folds, pps = [], [], []
        for pp, query in requests:
            pp_dev = pp if isinstance(pp, dict) else pp_to_device(params, pp)
            q_arr, v_folding = self.query_to_device(pp_dev, query)
            q_arrs.append(q_arr if sharded else self._jit_q_flat(q_arr))
            v_folds.append(v_folding)
            pps.append(pp_dev)
        if sharded:
            f_hi, f_lo = self._sharded.scan_fold_batched(
                self.db, jnp.stack(q_arrs), jnp.stack(v_folds))
        else:
            if not hasattr(self, "_jit_batched"):
                self._jit_batched = jax.jit(self._scan_fold_batched_impl)
            f_hi, f_lo = self._jit_batched(self.db, jnp.stack(q_arrs),
                                           jnp.stack(v_folds))
        # pack + encode ALL queries in one vmapped dispatch (packing keys
        # stacked per client) and fetch ONE word array — the per-query
        # loop paid a dispatch + fetch round trip per query (~28 ms each
        # through the harness tunnel)
        if not hasattr(self, "_jit_pack_encode_batched"):
            self._jit_pack_encode_batched = jax.jit(
                jax.vmap(self._pack_encode_impl))
        vp = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[pp_dev["v_packing"] for pp_dev in pps])
        words_all = self._jit_pack_encode_batched(f_hi, f_lo, vp)

        def fetch():
            host = np.asarray(words_all)       # one device->host transfer
            return [self._encode_plan.to_bytes(host[i])
                    for i in range(n_real)]

        return fetch


def encode_response(params: Params, packed: np.ndarray) -> bytes:
    """packed: (instances, n+1, n, poly_len) raw u64. Rescale + bit-pack
    (reference server.rs:470-503). Uses the native C++ codecs when built
    (the numpy rescale falls back to exact Python ints above 63 bits)."""
    from .. import native

    q1 = 4 * params.pt_modulus
    q1_bits = log2_ceil(q1)
    q2 = Q2_VALUES[params.q2_bits]
    q2_bits = params.q2_bits
    num_bits = params.instances * (
        q2_bits * params.n * params.poly_len
        + q1_bits * params.n * params.n * params.poly_len)
    num_bytes = ((num_bits + 63) // 64) * 8
    result = bytearray(num_bytes)
    bit_offs = 0
    for instance in range(params.instances):
        first_row = native.rescale_arr(packed[instance, 0], params.modulus, q2)
        rest_rows = native.rescale_arr(packed[instance, 1:], params.modulus, q1)
        bit_offs = native.write_fields(result, first_row.reshape(-1),
                                       bit_offs, q2_bits)
        bit_offs = native.write_fields(result, rest_rows.reshape(-1),
                                       bit_offs, q1_bits)
    return bytes(result)

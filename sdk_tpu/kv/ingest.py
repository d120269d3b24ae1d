"""DB ingestion: row bytes -> NTT-domain residue tensors and (batched)
device updates (reference lib/server/src/db/loading.rs:278-377).

Each item splits into instances*n*n chunks; chunk bytes become mod-p
coefficients (logp == 8 fast path, one byte per coefficient), recentered
into mod-Q, NTT'd, and written at the item's (dim0, num_per) coordinates of
the DB tensor. Updates are buffered host-side and flushed to the device in
one scatter before reads.
"""

from __future__ import annotations

import numpy as np

from ..arith import U64, log2_exact, recenter_mod_arr
from ..ntt_host import ntt_forward
from ..params import Params


def chunk_bytes_to_modp_words(params: Params,
                              chunk_rows: np.ndarray) -> np.ndarray:
    """(n_chunks, bytes_per_chunk) uint8 -> (n_chunks, modp_words_per_chunk)
    uint64 mod-p coefficients, reading logp-bit fields from each chunk's
    little-endian bitstream (reference read_arbitrary_bits, util.rs:289-303;
    logp == 8 degenerates to one byte per coefficient)."""
    logp = log2_exact(params.pt_modulus)
    n_chunks, pt_bytes = chunk_rows.shape
    n_coeffs = params.modp_words_per_chunk()
    assert n_coeffs <= params.poly_len
    if logp == 8:
        return chunk_rows.astype(U64)
    offs = logp * np.arange(n_coeffs, dtype=np.int64)
    byte_start = offs // 8
    shift = (offs % 8).astype(U64)
    padded = np.concatenate(
        [chunk_rows, np.zeros((n_chunks, 4), dtype=np.uint8)], axis=1)
    win = np.zeros((n_chunks, n_coeffs), dtype=U64)
    for b in range(4):
        win |= padded[:, byte_start + b].astype(U64) << U64(8 * b)
    return (win >> shift) & U64((1 << logp) - 1)


def convert_chunks_to_ntt(params: Params, data: bytes) -> np.ndarray:
    """data: zero-padded instances*trials*bytes_per_chunk bytes ->
    (instances*trials, crt, poly_len) uint32 NTT residues."""
    instances, trials = params.instances, params.n * params.n
    pt_len = params.bytes_per_chunk()
    n_chunks = instances * trials
    buf = np.zeros(n_chunks * pt_len, dtype=np.uint8)
    arr = np.frombuffer(data, dtype=np.uint8)
    buf[: len(arr)] = arr
    words = chunk_bytes_to_modp_words(params, buf.reshape(n_chunks, pt_len))
    n_coeffs = words.shape[1]
    coeffs = np.zeros((n_chunks, params.poly_len), dtype=U64)
    coeffs[:, :n_coeffs] = recenter_mod_arr(words, params.pt_modulus,
                                            params.modulus)
    chans = np.stack([coeffs % U64(q) for q in params.moduli], axis=-2)
    return ntt_forward(params, chans).astype(np.uint32)


def ingest_items_device(params: Params, raw_bytes):
    """Jitted index build: (K, instances*trials, bytes_per_chunk) uint8
    zero-padded chunk bytes -> (K, instances*trials, crt, poly_len) uint32
    NTT residues, all on device (the TPU analog of the reference's rayon
    par_chunks NTT encode, loading.rs:344-350). Any power-of-two p: logp-bit
    fields are gathered from each chunk's little-endian bitstream."""
    import jax.numpy as jnp

    from ..ops.ntt_jax import ntt_forward

    logp = log2_exact(params.pt_modulus)
    half = params.pt_modulus // 2
    if logp == 8:
        words = raw_bytes.astype(jnp.int32)
    else:
        n_coeffs = params.modp_words_per_chunk()
        offs = logp * np.arange(n_coeffs, dtype=np.int64)
        byte_start = jnp.asarray(offs // 8)
        shift = jnp.asarray((offs % 8).astype(np.uint32))
        padded = jnp.pad(raw_bytes, ((0, 0), (0, 0), (0, 4)))
        win = jnp.zeros(raw_bytes.shape[:2] + (n_coeffs,), dtype=jnp.uint32)
        for b in range(4):
            win = win | (jnp.take(padded, byte_start + b, axis=-1)
                         .astype(jnp.uint32) << jnp.uint32(8 * b))
        words = ((win >> shift) & jnp.uint32((1 << logp) - 1)).astype(jnp.int32)
    centered = jnp.where(words > half, words - params.pt_modulus, words)
    chans = []
    for q in params.moduli:
        v = jnp.where(centered < 0, centered + q, centered).astype(jnp.uint32)
        pad = params.poly_len - centered.shape[-1]
        if pad:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
        chans.append(v)
    stacked = jnp.stack(chans, axis=-2)   # (K, chunks, crt, poly_len)
    return ntt_forward(params, stacked)


class CompactSlots:
    """Host bookkeeping for the CompactDb layout: item index -> per-bin
    slot assignment (the compact analog of the reference SparseDb's
    id->offset map, db/sparse_db.rs:14-27)."""

    def __init__(self, params: Params, cap_bin: int = 8):
        self.num_per = 1 << params.db_dim_2
        self.dim0 = 1 << params.db_dim_1
        self.cap_bin = cap_bin
        self.slot_of: dict[int, int] = {}        # item idx -> slot in its bin
        self.bin_count = np.zeros(self.num_per, dtype=np.int64)

    def assign(self, idxs):
        """Assign slots for item idxs; returns (bins, slots, jvals, new_cap)
        where new_cap > cap_bin iff the planes must grow first."""
        bins = np.array([i % self.num_per for i in idxs], dtype=np.int64)
        jvals = np.array([i // self.num_per for i in idxs], dtype=np.int64)
        slots = np.empty(len(idxs), dtype=np.int64)
        for n, idx in enumerate(idxs):
            s = self.slot_of.get(idx)
            if s is None:
                b = int(bins[n])
                s = int(self.bin_count[b])
                self.bin_count[b] += 1
                self.slot_of[idx] = s
            slots[n] = s
        new_cap = self.cap_bin
        need = int(self.bin_count.max(initial=0))
        while new_cap < need:
            new_cap *= 2
        return bins, slots, jvals, min(new_cap, self.dim0)

    def clear(self) -> None:
        self.slot_of.clear()
        self.bin_count[:] = 0

    def to_state(self) -> dict:
        return {"cap_bin": self.cap_bin,
                "slot_of": {str(k): v for k, v in self.slot_of.items()}}

    def load_state(self, state: dict) -> None:
        self.cap_bin = state["cap_bin"]
        self.slot_of = {int(k): v for k, v in state["slot_of"].items()}
        self.bin_count[:] = 0
        for idx in self.slot_of:
            self.bin_count[idx % self.num_per] += 1


def compact_grow(db, new_cap: int):
    """Pad a CompactDb's slot axis to new_cap (capacity-quantized growth)."""
    import jax.numpy as jnp

    pad = new_cap - db.planes[0].shape[-1]
    if pad <= 0:
        return db
    from ..ops.spiral_jax import CompactDb

    planes = tuple(jnp.pad(p, [(0, 0)] * (p.ndim - 1) + [(0, pad)])
                   for p in db.planes)
    idx_j = jnp.pad(db.idx_j, [(0, 0), (0, pad)])
    return CompactDb(planes, idx_j)


def compact_to_dense(params: Params, db, layout: str = "latency"):
    """Device-side migration: scatter-ADD the compact columns onto a dense
    zero tensor in the requested dense layout (adds from unoccupied slots
    are zeros — harmless no-ops, so no occupancy mask is needed)."""
    import jax
    import jax.numpy as jnp

    from ..ops.server_jax import db_zeros_device
    from ..ops.spiral_jax import NUM_LIMBS

    num_per, cap = db.idx_j.shape
    bins = jnp.broadcast_to(jnp.arange(num_per, dtype=jnp.int32)[:, None],
                            (num_per, cap))

    dim0 = 1 << params.db_dim_1

    @jax.jit
    def mig(planes_c, idx_j):
        dense = db_zeros_device(params, layout)
        if layout == "throughput":
            # single-device only (compact buckets never shard), so the
            # dense target is the 5-D flat (..., L*dim0) channel form
            out = []
            for c, ch in enumerate(dense):
                for k in range(NUM_LIMBS):
                    ch = ch.at[:, :, :, bins, k * dim0 + idx_j].add(
                        planes_c[c * NUM_LIMBS + k])
                out.append(ch)
            return tuple(out)
        return tuple(d.at[:, :, :, bins, idx_j].add(p)
                     for d, p in zip(dense, planes_c))

    return mig(db.planes, db.idx_j)


class DbUpdateBuffer:
    """Host-side buffer of pending item updates, flushed as one device
    ingest + scatter (the TPU equivalent of SparseDb.upsert). Handles both
    the dense limb-plane layout and the O(populated) CompactDb layout
    (slot bookkeeping in self.slots)."""

    def __init__(self, params: Params, device_ingest: bool = True):
        self.params = params
        self.pending: dict[int, np.ndarray] = {}
        self.pending_raw: dict[int, np.ndarray] = {}
        self.device_ingest = device_ingest
        self.slots = CompactSlots(params)
        self._jit_ingest = None
        self._jit_scatter = None
        self._jit_scatter_compact = None

    def upsert(self, db_idx: int, ntt_chunks: np.ndarray) -> None:
        """ntt_chunks: (instances*trials, crt, poly_len) uint32 (host-side
        precomputed path)."""
        assert db_idx < self.params.num_items()
        self.pending[db_idx] = ntt_chunks
        self.pending_raw.pop(db_idx, None)

    def upsert_raw(self, db_idx: int, data: bytes) -> None:
        """Queue raw (compressed-row) bytes; the NTT encode runs on device
        at flush time."""
        params = self.params
        assert db_idx < params.num_items()
        n_chunks = params.instances * params.n * params.n
        pt_len = params.bytes_per_chunk()
        buf = np.zeros(n_chunks * pt_len, dtype=np.uint8)
        arr = np.frombuffer(data, dtype=np.uint8)
        buf[: len(arr)] = arr
        self.pending_raw[db_idx] = buf.reshape(n_chunks, pt_len)
        self.pending.pop(db_idx, None)

    def _resolve_pending(self):
        """Ingest pending raw rows on device and return (idxs, plane_vals):
        sorted item indices + per-plane int8 limb value arrays
        (z, inst, trials, K)."""
        import jax
        import jax.numpy as jnp

        from ..ops.spiral_jax import db_limbs_host

        params = self.params
        if self.pending_raw:
            if self._jit_ingest is None:
                self._jit_ingest = jax.jit(
                    lambda rb: ingest_items_device(params, rb))
            idxs_r = sorted(self.pending_raw)
            raw = np.stack([self.pending_raw[i] for i in idxs_r])
            ntt = np.asarray(self._jit_ingest(jnp.asarray(raw)))
            for i, idx in enumerate(idxs_r):
                self.pending[idx] = ntt[i]
            self.pending_raw.clear()

        idxs = sorted(self.pending)
        # (K, inst*trials, crt, poly_len) -> per-plane (z, inst, trials, K)
        vals = np.stack([self.pending[i] for i in idxs])
        K = len(idxs)
        vals = vals.reshape(K, params.instances, params.n * params.n,
                            params.crt_count, params.poly_len)
        vals = np.ascontiguousarray(vals.transpose(3, 4, 1, 2, 0))
        # (L, crt, z, inst, trials, K) int8
        limbs = db_limbs_host(params, vals)
        plane_vals = tuple(
            jnp.asarray(limbs[k, c])
            for c in range(params.crt_count)
            for k in range(limbs.shape[0]))
        return idxs, plane_vals

    def flush(self, db):
        """Apply all pending updates to the device DB; returns the new DB.
        Dispatches on the layout: dense limb planes get one donated scatter
        at (num_per, dim0) coordinates; a CompactDb gets slot assignment
        (+ capacity-quantized growth) and a donated scatter at
        (bin, slot)."""
        if not self.pending and not self.pending_raw:
            return db
        import jax
        import jax.numpy as jnp

        from ..ops.spiral_jax import CompactDb

        params = self.params
        num_per = 1 << params.db_dim_2
        idxs, plane_vals = self._resolve_pending()

        if isinstance(db, CompactDb):
            # the device array's slot capacity is authoritative
            self.slots.cap_bin = int(db.planes[0].shape[-1])
            bins, slotsv, jvals, new_cap = self.slots.assign(idxs)
            if new_cap > self.slots.cap_bin:
                db = compact_grow(db, new_cap)
                self.slots.cap_bin = new_cap
            if self._jit_scatter_compact is None:
                self._jit_scatter_compact = jax.jit(
                    lambda planes, ij, v, b, s, j1: (
                        tuple(p.at[:, :, :, b, s].set(vc)
                              for p, vc in zip(planes, v)),
                        ij.at[b, s].set(j1)),
                    donate_argnums=(0, 1))
            planes, idx_j = self._jit_scatter_compact(
                db.planes, db.idx_j, plane_vals, jnp.asarray(bins),
                jnp.asarray(slotsv), jnp.asarray(jvals, dtype=jnp.int32))
            self.pending.clear()
            return CompactDb(planes, idx_j)

        ii = np.array([i % num_per for i in idxs])   # num_per coordinate
        jj = np.array([i // num_per for i in idxs])  # dim0 coordinate
        # donate the DB buffers: the scatter must not hold two copies of a
        # multi-GB index in HBM (the caller immediately replaces its ref)
        if self._jit_scatter is None:
            from ..ops.spiral_jax import NUM_LIMBS

            crt = self.params.crt_count
            dim0 = 1 << self.params.db_dim_1

            def scatter(arrs, v, i1, j1):
                if arrs[0].ndim == 6 or len(arrs) == crt:
                    # throughput layout: crt channels, minor axis either
                    # (L, dim0) (sharded 6-D) or merged L*dim0 (5-D flat
                    # single-device) — one scatter per (channel, limb),
                    # same count as the per-plane layout below
                    out = []
                    for c, ch in enumerate(arrs):
                        for k in range(NUM_LIMBS):
                            if ch.ndim == 6:
                                ch = ch.at[:, :, :, i1, k, j1].set(
                                    v[c * NUM_LIMBS + k])
                            else:
                                ch = ch.at[:, :, :, i1, k * dim0 + j1].set(
                                    v[c * NUM_LIMBS + k])
                        out.append(ch)
                    return tuple(out)
                return tuple(p.at[:, :, :, i1, j1].set(vc)
                             for p, vc in zip(arrs, v))

            self._jit_scatter = jax.jit(scatter, donate_argnums=0)
        db = self._jit_scatter(db, plane_vals, jnp.asarray(ii),
                               jnp.asarray(jj))
        self.pending.clear()
        return db

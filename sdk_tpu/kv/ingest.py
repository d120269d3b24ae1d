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


def convert_chunks_to_ntt(params: Params, data: bytes) -> np.ndarray:
    """data: zero-padded instances*trials*bytes_per_chunk bytes ->
    (instances*trials, crt, poly_len) uint32 NTT residues."""
    instances, trials = params.instances, params.n * params.n
    logp = log2_exact(params.pt_modulus)
    assert logp == 8, "fast ingestion path requires p = 256 (loading.rs:289)"
    pt_len = params.bytes_per_chunk()
    n_chunks = instances * trials
    buf = np.zeros(n_chunks * pt_len, dtype=np.uint8)
    arr = np.frombuffer(data, dtype=np.uint8)
    buf[: len(arr)] = arr
    words = buf.reshape(n_chunks, pt_len).astype(U64)
    assert pt_len <= params.poly_len
    coeffs = np.zeros((n_chunks, params.poly_len), dtype=U64)
    coeffs[:, :pt_len] = recenter_mod_arr(words, params.pt_modulus, params.modulus)
    chans = np.stack([coeffs % U64(q) for q in params.moduli], axis=-2)
    return ntt_forward(params, chans).astype(np.uint32)


def ingest_items_device(params: Params, raw_bytes):
    """Jitted index build: (K, instances*trials, bytes_per_chunk) uint8
    zero-padded chunk bytes -> (K, instances*trials, crt, poly_len) uint32
    NTT residues, all on device (the TPU analog of the reference's rayon
    par_chunks NTT encode, loading.rs:344-350)."""
    import jax.numpy as jnp

    from ..ops.ntt_jax import ntt_forward

    logp = log2_exact(params.pt_modulus)
    assert logp == 8
    half = params.pt_modulus // 2
    words = raw_bytes.astype(jnp.int32)
    centered = jnp.where(words > half, words - params.pt_modulus, words)
    chans = []
    for q in params.moduli:
        v = jnp.where(centered < 0, centered + q, centered).astype(jnp.uint32)
        pad = params.poly_len - raw_bytes.shape[-1]
        if pad:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
        chans.append(v)
    stacked = jnp.stack(chans, axis=-2)   # (K, chunks, crt, poly_len)
    return ntt_forward(params, stacked)


class DbUpdateBuffer:
    """Host-side buffer of pending item updates, flushed as one device
    ingest + scatter (the TPU equivalent of SparseDb.upsert)."""

    def __init__(self, params: Params, device_ingest: bool = True):
        self.params = params
        self.pending: dict[int, np.ndarray] = {}
        self.pending_raw: dict[int, np.ndarray] = {}
        self.device_ingest = device_ingest
        self._jit_ingest = None

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

    def flush(self, db):
        """Apply all pending updates to the device DB tensor
        (inst, trials, crt, poly_len, num_per, dim0); returns the new tensor."""
        if not self.pending and not self.pending_raw:
            return db
        import jax
        import jax.numpy as jnp

        params = self.params
        num_per = 1 << params.db_dim_2

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
        # (K, inst*trials, crt, poly_len) -> (inst, trials, crt, poly_len, K)
        vals = np.stack([self.pending[i] for i in idxs])
        K = len(idxs)
        vals = vals.reshape(K, params.instances, params.n * params.n,
                            params.crt_count, params.poly_len)
        vals = np.ascontiguousarray(vals.transpose(1, 2, 3, 4, 0))
        ii = np.array([i % num_per for i in idxs])   # num_per coordinate
        jj = np.array([i // num_per for i in idxs])  # dim0 coordinate
        db = db.at[:, :, :, :, ii, jj].set(jnp.asarray(vals))
        self.pending.clear()
        return db

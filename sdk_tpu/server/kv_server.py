"""Server state machine: rows, public params, and the device DB tensor.

Mirrors the reference server's state (bin/server.rs:22-29) and routes'
semantics; the compute plane is sdk_tpu.ops.server_jax on TPU.
"""

from __future__ import annotations

import base64
import json
import threading
import time
import uuid as uuidlib

import numpy as np

from ..client import PublicParameters, Query
from ..kv.ingest import DbUpdateBuffer, convert_chunks_to_ntt
from ..kv.write import compress_row, unwrap_kv_pairs, update_row
from ..kv.key_value import row_from_key
from ..params import Params, params_to_json_obj
from ..ops.server_jax import SpiralServerJax, pp_to_device

UUID_V4_STR_BYTES = 36


class BucketCapacityError(RuntimeError):
    """The dense encrypted index + serving working set exceed the device
    memory budget. Raised BEFORE the allocation that would OOM the chip
    (TPU-native hygiene the reference's malloc-and-hope server lacks;
    round 4 found the batch-16 OOM at bench time by luck)."""


class SpiralKvServer:
    """One bucket: Spiral params + rows + encrypted index on device."""

    def __init__(self, params: Params, params_json: str | None = None,
                 key_storage_policy: str = "bloom", mesh=None,
                 dense_layout: str = "latency"):
        import jax.numpy as jnp

        self.params = params
        self.params_json = params_json or json.dumps(params_to_json_obj(params))
        self.name = ""
        self.destroyed = False
        self.rows: list[bytearray] = [bytearray() for _ in range(params.num_items())]
        self.pub_params: dict[str, dict] = {}
        self.version = 0
        self.lock = threading.RLock()
        # key storage policy: 'none' | 'bloom' | 'full' (reference
        # bucket_service.ts keyStoragePolicy); bloom enables
        # private_key_intersect's prefilter
        self.key_storage_policy = key_storage_policy
        self._key_bloom = None
        self._stored_keys: set[str] = set()
        if key_storage_policy in ("bloom", "full"):
            from ..clients.bloom import BloomFilter

            bits = params.db_dim_1 + params.db_dim_2 + 6
            self._key_bloom = BloomFilter.empty(8, bits)

        # mesh: a jax.sharding.Mesh with axes (dp, db) — serve from a
        # row-sharded DB with psum partial-response reduction over ICI
        # (sdk_tpu.ops.shard; the production shape of the reference's
        # per-instance parallelism, lib/server/src/server.rs:53-96).
        # dense DB storage profile (ops/server_jax.db_tensor_to_device):
        # "latency" (default) optimizes the single-query scan, "throughput"
        # the batched one (1.6x at NQ=16); both bit-exact
        self.engine = SpiralServerJax(params, mesh=mesh,
                                      dense_layout=dense_layout)
        # Unsharded buckets start in the O(populated) CompactDb layout (the
        # reference SparseDb's memory model, db/sparse_db.rs:1-48): an empty
        # bucket pins ~cap_bin/dim0 of the dense HBM footprint. Once the
        # populated fraction crosses dense_migrate_fill the index migrates
        # to the dense limb planes (faster per-byte MXU scan; measured
        # crossover ~12.5% fill at the 1 GiB shape — tools/
        # profile_compact.py). Sharded serving always runs dense.
        self.dense_migrate_fill = 0.125
        # Device-memory budget for the capacity guard (_check_capacity):
        # None = autodetect from the device (memory_stats bytes_limit);
        # set a byte count to override (tests use a tiny one). When the
        # backend reports no limit (CPU mesh; the axon tunnel device
        # returns memory_stats()=None) and no override is set, the guard
        # is a no-op — co-located TPU runtimes report bytes_limit and get
        # the protection automatically.
        self.hbm_budget_bytes: int | None = None
        # planned max concurrent batch size for the capacity estimate
        # (the coalescer pads to pow2; size the working set for the
        # largest batch you intend to serve)
        self.capacity_nq = 16
        self._migration_refused = False
        if self.engine._sharded is not None:
            from ..ops.server_jax import db_zeros_device

            self._check_capacity()   # dense from the start when sharded
            db0 = self.engine._sharded.shard_db(
                db_zeros_device(params, dense_layout, sharded=True))
        else:
            from ..ops.spiral_jax import compact_db_empty

            db0 = compact_db_empty(params)
        self.engine.db = db0
        self._updates = DbUpdateBuffer(params)
        # populated item indices (over-approximation of nonzero DB rows):
        # drives the compacted sparse query expansion (reference skip sets,
        # query_expansion.rs:213-248). Sparse expansion only pays off while
        # the populated first-dim fraction is small.
        self._populated_items: set[int] = set()
        self._pop_dirty = False
        self.sparse_expansion_max_fill = 0.25

    # --- capacity guard ---

    def _device_budget_bytes(self) -> int | None:
        import os

        if os.environ.get("SDK_TPU_NO_CAPACITY_GUARD"):
            return None
        if self.hbm_budget_bytes is not None:
            return self.hbm_budget_bytes
        env = os.environ.get("SDK_TPU_HBM_BUDGET_BYTES")
        if env:
            # deployments whose runtime reports no memory_stats (e.g. the
            # axon tunnel device) can still opt into the guard
            return int(env)
        try:
            import jax

            stats = jax.local_devices()[0].memory_stats()
            limit = int(stats.get("bytes_limit", 0)) if stats else 0
            return limit or None
        except Exception:  # noqa: BLE001 — no stats => guard disabled
            return None

    def _check_capacity(self) -> None:
        """Refuse a dense index that cannot fit next to its serving
        working set — BEFORE the allocation that would OOM the chip
        mid-flush. Sharded serving divides the index over the "db" mesh
        axis; the error names the max bucket size for this budget and the
        escape hatches."""
        from ..ops.server_jax import index_hbm_bytes, serving_working_set_bytes

        budget = self._device_budget_bytes()
        if budget is None:
            return
        params = self.params
        ndev = 1
        if self.engine._sharded is not None:
            ndev = self.engine._sharded.mesh.shape.get("db", 1)
        idx = index_hbm_bytes(params) // ndev
        ws = serving_working_set_bytes(params, nq=self.capacity_nq,
                                       chunk=self.engine.batch_chunk)
        ws += self.engine.stack_cache_budget_bytes()
        if idx + ws <= budget:
            return
        per_item = index_hbm_bytes(params) // params.num_items()
        max_items = max(int((budget - ws) * ndev // per_item), 0)
        max_bytes = max_items * params.db_item_size
        raise BucketCapacityError(
            f"dense index needs {idx / 1e9:.2f} GB/device + "
            f"{ws / 1e9:.2f} GB serving working set, but the device "
            f"budget is {budget / 1e9:.2f} GB. Max bucket at these params "
            f"on this budget: ~{max_items} items ({max_bytes / 1e9:.2f} GB "
            f"of {params.db_item_size}-byte items). Escape hatches: serve "
            f"from a sharded mesh (SpiralKvServer(mesh=...), rows split "
            f"over the 'db' axis) or split the bucket across hosts behind "
            f"the DCN front end (sdk_tpu.server.dcn).")

    # --- writes ---

    def write_kv(self, body: bytes) -> dict:
        t0 = time.time()
        with self.lock:
            kv_pairs = unwrap_kv_pairs(body)
            by_row: dict[int, list[tuple[str, bytes]]] = {}
            for k, v in kv_pairs:
                by_row.setdefault(row_from_key(len(self.rows), k), []).append((k, v))
            for row_id in sorted(by_row):
                for k, v in by_row[row_id]:
                    update_row(self.rows[row_id], k, v)
                    if v and self._key_bloom is not None:
                        self._key_bloom.insert(k)
                    if v and self.key_storage_policy == "full":
                        self._stored_keys.add(k)
                    elif not v:
                        self._stored_keys.discard(k)
                compressed = compress_row(self.rows[row_id])
                self.update_item_raw(row_id, compressed)
            self.version += 1
        return {"status": "done updating",
                "loading_time_us": int((time.time() - t0) * 1e6)}

    def update_item_raw(self, db_idx: int, data: bytes) -> None:
        params = self.params
        max_len = params.instances * params.n * params.n * params.bytes_per_chunk()
        if len(data) > max_len:
            raise ValueError(f"row {db_idx} data too large: {len(data)} > {max_len}")
        # NTT encode runs on device in one batch at flush time
        self._updates.upsert_raw(db_idx, data)
        if db_idx not in self._populated_items:
            self._populated_items.add(db_idx)
            self._pop_dirty = True

    def update_item(self, body: bytes) -> None:
        """body = u32 idx BE || chunk bytes (loading.rs:301-316)."""
        db_idx = int.from_bytes(body[:4], "big")
        if db_idx >= self.params.num_items():
            raise ValueError(f"bad db idx {db_idx}")
        self.update_item_raw(db_idx, body[4:])

    def update_many_items(self, body: bytes) -> int:
        """length-prefixed concatenation of update_item bodies
        (loading.rs:361-377)."""
        offs = 0
        largest = 0
        with self.lock:
            while offs < len(body):
                chunk_len = int.from_bytes(body[offs : offs + 4], "big")
                data = body[offs + 4 : offs + 4 + chunk_len]
                largest = max(largest, len(data))
                self.update_item(data)
                offs += 4 + chunk_len
        return largest

    def _flush(self):
        from ..ops.spiral_jax import CompactDb

        if (isinstance(self.engine.db, CompactDb)
                and not self._migration_refused
                and len(self._populated_items)
                > self.dense_migrate_fill * self.params.num_items()):
            try:
                self._check_capacity()   # refuse, don't OOM, if it can't fit
            except BucketCapacityError as e:
                # Degrade, don't die: the compact layout serves ANY fill
                # (just slower per byte past the crossover), so a bucket
                # that cannot afford the dense index stays compact and
                # keeps serving. Raising here would turn every subsequent
                # read into an error (flush runs lazily on the read path).
                # Construction (sharded) and restore still raise — those
                # are explicit operator actions.
                import logging

                logging.getLogger(__name__).warning(
                    "dense migration refused; serving stays compact: %s", e)
                self._migration_refused = True
            else:
                from ..kv.ingest import compact_to_dense

                self.engine.db = compact_to_dense(self.params,
                                                  self.engine.db,
                                                  self.engine.dense_layout)
                self._updates.slots.clear()
        db = self._updates.flush(self.engine.db)
        if db is not self.engine.db and self.engine._sharded is not None:
            # the scatter may not preserve the NamedSharding; re-pin
            db = self.engine._sharded.shard_db(db)
        self.engine.db = db
        if self._pop_dirty:
            params = self.params
            dim0 = 1 << params.db_dim_1
            dim0_set = {i >> params.db_dim_2 for i in self._populated_items}
            use = 0 < len(dim0_set) <= int(dim0 * self.sparse_expansion_max_fill)
            self.engine.set_populated_dim0(dim0_set if use else None)
            self._pop_dirty = False

    # --- setup / read ---

    def setup_raw(self, raw: bytes, uid: str | None = None) -> str:
        assert len(raw) == self.params.setup_bytes()
        pp = PublicParameters.deserialize(self.params, raw)
        uid = uid or str(uuidlib.uuid4())
        with self.lock:
            self.pub_params[uid] = pp_to_device(self.params, pp)
        return uid

    def setup(self, body: bytes) -> str:
        """body: JSON string of base64 public params; returns uuid."""
        pp_b64 = json.loads(body)
        return self.setup_raw(base64.b64decode(pp_b64))

    def has_uuid(self, uid: str) -> bool:
        return uid in self.pub_params

    def _parse_request(self, request_bytes: bytes):
        params = self.params
        if params.expand_queries:
            assert len(request_bytes) == UUID_V4_STR_BYTES + params.query_bytes()
            uid = request_bytes[:UUID_V4_STR_BYTES].decode()
            if uid not in self.pub_params:
                raise KeyError(uid)
            pp_dev = self.pub_params[uid]
            query = Query.deserialize(params, request_bytes[UUID_V4_STR_BYTES:])
        else:
            assert len(request_bytes) == params.setup_bytes() + params.query_bytes()
            pp = PublicParameters.deserialize(
                params, request_bytes[: params.setup_bytes()])
            pp_dev = pp_to_device(params, pp)
            query = Query.deserialize(params, request_bytes[params.setup_bytes():])
        return pp_dev, query

    def private_read_one(self, request_bytes: bytes) -> bytes:
        with self.lock:
            self._flush()
            pp_dev, query = self._parse_request(request_bytes)
            return self.engine.process_query(pp_dev, query)

    def private_read_blobs(self, blobs: list[bytes]) -> list[bytes]:
        """Raw request blobs -> response bytes; one fused DB scan.
        Dispatch runs under the lock (a concurrent flush donates the DB
        buffer); the blocking device fetch runs outside it so writes
        proceed while the device crunches."""
        return self.dispatch_read_blobs(blobs)()

    def dispatch_read_blobs(self, blobs: list[bytes]):
        """Two-phase read: enqueue the batch on device and return a
        zero-arg fetch closure. Callers that dispatch batch N+1 BEFORE
        fetching batch N pipeline the device: batch N's response transfer
        (and the dispatch round trip) overlap batch N+1's execution, so
        sustained throughput approaches the device-work floor instead of
        device + transfer + RTT per batch. JAX queues the programs; the
        runtime keeps every in-flight batch's buffers alive, and a flush
        between two dispatches is safe for the same reason single-batch
        two-phase serving is (donated buffers stay alive for in-flight
        programs; see dispatch_queries_batched). Fetches may be called in
        any order. (The reference's batch loop is strictly serial,
        lib/server/src/server.rs:53-96 — this is TPU-native headroom.)"""
        with self.lock:
            self._flush()
            reqs = [self._parse_request(b) for b in blobs]
            return self.engine.dispatch_queries_batched(reqs)

    def warmup(self) -> float:
        """Pre-compile the hot serving path before traffic arrives: one
        synthetic protocol round (throwaway client keys -> setup -> query
        for row 0) through the real read path, session discarded after.
        A cold first query otherwise pays the full XLA compile (tens of
        seconds on TPU, minutes on CPU). Compiles the program for the
        CURRENT index state (dense vs sparse-expansion vs compact layouts
        jit separately), so call it after restore_from_dir or the initial
        writes. Returns elapsed seconds."""
        import time as _time

        from ..client import Client

        t0 = _time.monotonic()
        client = Client(self.params)
        pp = client.generate_keys()
        qbytes = client.generate_query(0).serialize(self.params)
        if self.params.expand_queries:
            uid = self.setup_raw(pp.serialize(self.params))
            try:
                self.private_read_blobs([uid.encode() + qbytes])
            finally:
                with self.lock:
                    self.pub_params.pop(uid, None)
        else:
            self.private_read_blobs([pp.serialize(self.params) + qbytes])
        return _time.monotonic() - t0

    def private_read(self, body: bytes) -> bytes:
        """JSON list of base64 queries -> JSON list of base64 responses
        (bin/server.rs:143-163). Multi-query requests share one DB scan
        (batched MXU columns)."""
        query_strs = json.loads(body)
        results = self.private_read_blobs(
            [base64.b64decode(qs) for qs in query_strs])
        out = [base64.b64encode(r).decode() for r in results]
        return json.dumps(out).encode()

    def bloom_bytes(self) -> bytes:
        if self._key_bloom is None:
            raise KeyError("bloom")
        return self._key_bloom.to_bytes()

    def list_keys(self) -> list[str]:
        if self.key_storage_policy != "full":
            raise KeyError("list-keys")
        return sorted(self._stored_keys)

    def clear(self) -> None:
        """Delete all rows but keep metadata/public params
        (reference clear_entire_bucket semantics)."""
        import jax.numpy as jnp

        with self.lock:
            for r in self.rows:
                r.clear()
            import jax

            if self.engine._sharded is None:
                # drop back to a fresh minimal compact index (releases the
                # dense HBM if the bucket had migrated)
                from ..kv.ingest import CompactSlots
                from ..ops.spiral_jax import compact_db_empty

                db0 = compact_db_empty(self.params)
                self._updates.slots = CompactSlots(self.params)
            else:
                db0 = jax.tree.map(jnp.zeros_like, self.engine.db)
                db0 = self.engine._sharded.shard_db(db0)
            self.engine.db = db0
            self._updates.pending.clear()
            self._updates.pending_raw.clear()
            self._populated_items.clear()
            self._pop_dirty = False
            self._migration_refused = False
            self.engine.set_populated_dim0(None)
            self._stored_keys.clear()
            if self._key_bloom is not None:
                from ..clients.bloom import BloomFilter

                self._key_bloom = BloomFilter.empty(
                    self._key_bloom.k, self._key_bloom.bits)
            self.version += 1

    def rename(self, new_name: str) -> None:
        """Bucket rename (reference /modify route, js bucket.ts rename)."""
        with self.lock:
            self.name = new_name

    def destroy(self) -> None:
        """Destroy the bucket entirely: all state gone, subsequent requests
        404 (reference destroy_entire_bucket semantics — the hosted service
        removes the bucket; this single-bucket server tombstones it)."""
        with self.lock:
            self.clear()
            self.pub_params.clear()
            self.destroyed = True

    def meta(self) -> dict:
        return {
            "id": 0,
            "name": self.name,
            "owner_id": 0,
            "open_access": True,
            "pir_scheme": json.loads(self.params_json),
            "global_version": self.version,
        }

    def metrics(self) -> dict:
        from ..telemetry import GLOBAL_TIMERS

        return {"stages": GLOBAL_TIMERS.snapshot(), "version": self.version,
                "num_rows_populated": sum(1 for r in self.rows if r)}

    # --- checkpoint/restore of the preprocessed encrypted index ---
    # (reference: load_preprocessed_db_from_file, db/loading.rs:263-276, and
    #  DoublePIR's file persistence pattern)

    def save_to_dir(self, path: str) -> None:
        import os
        import pickle

        os.makedirs(path, exist_ok=True)
        from ..ops.spiral_jax import CompactDb

        with self.lock:
            self._flush()
            compact = isinstance(self.engine.db, CompactDb)
            planes = self.engine.db.planes if compact else self.engine.db
            # stream one limb plane/channel at a time into the .npy (a full
            # np.stack would double host RAM at multi-GB indexes); the
            # throughput dense layout saves as (crt, z,a,t,npr,L,dim0)
            # ndim-7 (the single-device 5-D flat channels reshape their
            # merged minor axis back to (L, dim0) host-side — free, and
            # keeps the checkpoint format layout-independent), the plane
            # layouts as (crt*L, ...) ndim-6
            from ..ops.spiral_jax import NUM_LIMBS

            tp_flat = (not compact and self.engine.dense_layout
                       == "throughput" and planes[0].ndim == 5)
            pshape = tuple(planes[0].shape)
            if tp_flat:
                pshape = pshape[:-1] + (NUM_LIMBS, pshape[-1] // NUM_LIMBS)
            shape = (len(planes),) + pshape
            out = np.lib.format.open_memmap(
                os.path.join(path, "db_tensor.npy"), mode="w+",
                dtype=np.int8, shape=shape)
            for i, p in enumerate(planes):
                out[i] = np.asarray(p).reshape(pshape)
            out.flush()
            del out
            if compact:
                np.save(os.path.join(path, "db_idx_j.npy"),
                        np.asarray(self.engine.db.idx_j))
            with open(os.path.join(path, "rows.pkl"), "wb") as f:
                pickle.dump([bytes(r) for r in self.rows], f)
            state = {"version": self.version,
                     "params_json": self.params_json,
                     "key_storage_policy": self.key_storage_policy,
                     "stored_keys": sorted(self._stored_keys),
                     "populated_items": sorted(self._populated_items),
                     "db_format": "compact" if compact else "dense"}
            if compact:
                state["compact_slots"] = self._updates.slots.to_state()
            if self._key_bloom is not None:
                state["key_bloom"] = self._key_bloom.to_bytes().hex()
            with open(os.path.join(path, "state.json"), "w") as f:
                json.dump(state, f)

    def restore_from_dir(self, path: str) -> None:
        import os
        import pickle

        import jax.numpy as jnp

        with self.lock:
            from ..kv.ingest import CompactSlots
            from ..ops.spiral_jax import NUM_LIMBS, CompactDb, db_limbs_host

            with open(os.path.join(path, "state.json")) as f:
                state = json.load(f)
            self._migration_refused = False
            # memmap: planes stream file -> device one at a time instead of
            # materializing the whole multi-GB index in host RAM first
            db = np.load(os.path.join(path, "db_tensor.npy"), mmap_mode="r")
            crt = self.params.crt_count
            want_tp = (self.engine.dense_layout == "throughput"
                       and state.get("db_format") != "compact")
            if db.ndim == 6 and db.dtype == np.uint32:
                # legacy pre-limb checkpoint: (inst, trials, crt, z, i, j)
                # u32 -> limb planes
                u32 = np.ascontiguousarray(db.transpose(2, 3, 0, 1, 4, 5))
                limbs = db_limbs_host(self.params, u32)  # (L, crt, z, ...)
                planes = tuple(limbs[k, c] for c in range(crt)
                               for k in range(limbs.shape[0]))
            elif db.ndim == 7:
                # throughput dense layout: (crt, z, inst, trials, i, L, j)
                assert db.dtype == np.int8, db.dtype
                assert db.shape[0] == crt and db.shape[-2] == NUM_LIMBS
                planes = tuple(db[i] for i in range(crt))
            else:
                # plane formats: stacked (crt*L, z, inst, trials, i, cols)
                # int8; cols = dim0 (dense) or cap_bin (compact)
                assert db.ndim == 6 and db.dtype == np.int8, (
                    db.shape, db.dtype)
                planes = tuple(db[i] for i in range(db.shape[0]))
            # convert between dense layouts when the checkpoint's layout
            # differs from the server's configured one (host-side, one
            # channel at a time off the memmap); the checkpoint stores
            # throughput channels with (L, dim0) as separate axes —
            # single-device serving merges them to the 5-D flat form
            # (sharded keeps 6-D: "db" shards dim0, ops/shard.py)
            if want_tp and planes[0].ndim == 5 and len(planes) != crt:
                planes = tuple(
                    np.stack(planes[c * NUM_LIMBS:(c + 1) * NUM_LIMBS],
                             axis=-2) for c in range(crt))
            elif not want_tp and planes[0].ndim == 6:
                planes = tuple(np.ascontiguousarray(planes[c][..., k, :])
                               for c in range(crt)
                               for k in range(NUM_LIMBS))
            if (want_tp and planes[0].ndim == 6
                    and self.engine._sharded is None):
                planes = tuple(
                    np.asarray(p).reshape(p.shape[:-2] + (-1,))
                    for p in planes)
            assert len(planes) == (crt if want_tp else crt * NUM_LIMBS)
            if state.get("db_format") != "compact":
                self._check_capacity()   # refuse, don't OOM, mid-restore
                # release the resident index BEFORE uploading the new one:
                # holding both would transiently need ~2x the index bytes
                # (the guard budgets one)
                from ..ops.spiral_jax import compact_db_empty

                self.engine.db = None if self.engine._sharded is not None \
                    else compact_db_empty(self.params)
            db_dev = tuple(jnp.asarray(p) for p in planes)
            if state.get("db_format") == "compact":
                assert self.engine._sharded is None
                idx_j = jnp.asarray(
                    np.load(os.path.join(path, "db_idx_j.npy")))
                self.engine.db = CompactDb(db_dev, idx_j)
                slots = CompactSlots(self.params)
                slots.load_state(state["compact_slots"])
                assert slots.cap_bin == planes[0].shape[-1]
                self._updates.slots = slots
            else:
                if self.engine._sharded is not None:
                    db_dev = self.engine._sharded.shard_db(db_dev)
                self.engine.db = db_dev
            with open(os.path.join(path, "rows.pkl"), "rb") as f:
                self.rows = [bytearray(r) for r in pickle.load(f)]
            self.version = state["version"]
            self._stored_keys = set(state.get("stored_keys", []))
            if "populated_items" in state:
                self._populated_items = set(state["populated_items"])
                self._pop_dirty = True
            else:
                # older checkpoint: no reliable population info — stay dense
                self._populated_items = set()
                self._pop_dirty = False
                self.engine.set_populated_dim0(None)
            if "key_bloom" in state and self._key_bloom is not None:
                from ..clients.bloom import BloomFilter

                self._key_bloom = BloomFilter.from_bytes(
                    bytes.fromhex(state["key_bloom"]))
            self._updates.pending.clear()

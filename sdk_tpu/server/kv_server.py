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


class SpiralKvServer:
    """One bucket: Spiral params + rows + encrypted index on device."""

    def __init__(self, params: Params, params_json: str | None = None):
        import jax.numpy as jnp

        self.params = params
        self.params_json = params_json or json.dumps(params_to_json_obj(params))
        self.rows: list[bytearray] = [bytearray() for _ in range(params.num_items())]
        self.pub_params: dict[str, dict] = {}
        self.version = 0
        self.lock = threading.RLock()

        self.engine = SpiralServerJax(params)
        dim0 = 1 << params.db_dim_1
        num_per = 1 << params.db_dim_2
        self.engine.db = jnp.zeros(
            (params.instances, params.n * params.n, params.crt_count,
             params.poly_len, num_per, dim0), dtype=jnp.uint32)
        self._updates = DbUpdateBuffer(params)

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
        self._updates.upsert(db_idx, convert_chunks_to_ntt(params, data))

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
        self.engine.db = self._updates.flush(self.engine.db)

    # --- setup / read ---

    def setup(self, body: bytes) -> str:
        """body: JSON string of base64 public params; returns uuid."""
        pp_b64 = json.loads(body)
        raw = base64.b64decode(pp_b64)
        assert len(raw) == self.params.setup_bytes()
        pp = PublicParameters.deserialize(self.params, raw)
        uid = str(uuidlib.uuid4())
        with self.lock:
            self.pub_params[uid] = pp_to_device(self.params, pp)
        return uid

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

    def private_read(self, body: bytes) -> bytes:
        """JSON list of base64 queries -> JSON list of base64 responses
        (bin/server.rs:143-163). Multi-query requests share one DB scan
        (batched MXU columns)."""
        query_strs = json.loads(body)
        with self.lock:
            self._flush()
            reqs = [self._parse_request(base64.b64decode(qs))
                    for qs in query_strs]
            results = self.engine.process_queries_batched(reqs)
        out = [base64.b64encode(r).decode() for r in results]
        return json.dumps(out).encode()

    def meta(self) -> dict:
        return {
            "id": 0,
            "name": "",
            "owner_id": 0,
            "open_access": True,
            "pir_scheme": json.loads(self.params_json),
            "global_version": self.version,
        }

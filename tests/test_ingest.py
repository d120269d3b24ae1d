"""Device DB ingestion (jitted NTT encode) vs the host path, and the
update-row HTTP route."""

import json
import socket

import numpy as np
import pytest

from sdk_tpu.kv.ingest import (DbUpdateBuffer, convert_chunks_to_ntt,
                               ingest_items_device)
from sdk_tpu.params import get_fast_expansion_testing_params, params_to_json_obj

RNG = np.random.default_rng(19)


def test_device_ingest_matches_host():
    import jax
    import jax.numpy as jnp

    params = get_fast_expansion_testing_params()
    n_chunks = params.instances * params.n * params.n
    pt_len = params.bytes_per_chunk()
    data = RNG.integers(0, 256, n_chunks * pt_len, dtype=np.uint64).astype(np.uint8)
    want = convert_chunks_to_ntt(params, data.tobytes())
    got = np.asarray(jax.jit(lambda rb: ingest_items_device(params, rb))(
        jnp.asarray(data.reshape(1, n_chunks, pt_len))))
    np.testing.assert_array_equal(got[0], want)


def test_buffer_raw_vs_precomputed():
    import jax.numpy as jnp

    from sdk_tpu.ops.server_jax import db_zeros_device

    params = get_fast_expansion_testing_params()

    data = RNG.integers(0, 256, 100, dtype=np.uint64).astype(np.uint8).tobytes()

    b1 = DbUpdateBuffer(params)
    b1.upsert(7, convert_chunks_to_ntt(params, data))
    db1 = b1.flush(db_zeros_device(params))

    b2 = DbUpdateBuffer(params)
    b2.upsert_raw(7, data)
    db2 = b2.flush(db_zeros_device(params))
    np.testing.assert_array_equal(np.asarray(db1), np.asarray(db2))


def test_update_row_http_route():
    """POST /update-row with (u32 len BE | u32 idx BE | chunk bytes)* then
    read the row back privately (reference bin/server.rs:31-43 +
    loading.rs:361-377)."""
    from sdk_tpu.clients.bucket_service import connect_local
    from sdk_tpu.clients.api import API
    from sdk_tpu.kv.key_value import row_from_key
    from sdk_tpu.kv.write import compress_row, update_row
    from sdk_tpu.server.http import serve
    from sdk_tpu.server.kv_server import SpiralKvServer
    import urllib.request

    params = get_fast_expansion_testing_params()
    srv = SpiralKvServer(params, json.dumps(params_to_json_obj(params)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    httpd = serve(srv, port, block=False)
    try:
        # build the row payload client-side, upload raw
        row = bytearray()
        update_row(row, "raw-key", b"raw-value")
        payload = compress_row(row)
        row_id = row_from_key(params.num_items(), "raw-key")
        item = row_id.to_bytes(4, "big") + payload
        body = len(item).to_bytes(4, "big") + item
        req = urllib.request.Request(
            f"http://localhost:{port}/update-row", data=body)
        with urllib.request.urlopen(req) as r:
            resp = json.loads(r.read())
        assert resp["status"] == "done updating"

        bucket = connect_local(port)
        assert bucket.private_read(["raw-key"]) == [b"raw-value"]
    finally:
        httpd.shutdown()

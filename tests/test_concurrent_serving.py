"""Reads overlapped with writes: the two-phase dispatch/fetch serving path.

dispatch_queries_batched runs under the server lock (a concurrent flush
DONATES the device DB buffer — kv/ingest._jit_scatter — so a dispatch
racing the donation would hit a deleted array); the blocking fetch runs
outside the lock so writers proceed during device compute. This stress
test interleaves private reads with flushing writes from a writer thread
and asserts every read decodes its key bit-exactly and no read ever
observes a deleted-buffer error.
"""

import base64
import json
import threading

import pytest

from sdk_tpu.params import (get_fast_expansion_testing_params,
                            params_to_json_obj)


def test_reads_interleaved_with_donating_writes():
    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_fast_expansion_testing_params()
    cfg = json.dumps(params_to_json_obj(params))
    srv = SpiralKvServer(params, cfg)

    def write(kv: dict) -> None:
        srv.write_kv(json.dumps(
            {k: base64.b64encode(v).decode()
             for k, v in kv.items()}).encode())
        with srv.lock:
            srv._flush()   # force the donating scatter

    write({"stable-key": b"stable-value"})

    from tests.util_protocol import read_via_protocol

    stop = threading.Event()
    writer_errors: list[BaseException] = []

    def writer():
        i = 0
        while not stop.is_set():
            try:
                write({f"churn-{i % 7}": f"val-{i}".encode()})
            except BaseException as e:  # noqa: BLE001
                writer_errors.append(e)
                return
            i += 1

    t = threading.Thread(target=writer)
    t.start()
    try:
        for _ in range(12):
            assert read_via_protocol(srv, "stable-key") == b"stable-value"
    finally:
        stop.set()
        t.join(timeout=60)
    assert not writer_errors, writer_errors
    # a churned key written during the storm is readable afterwards
    write({"after-key": b"after-value"})
    assert read_via_protocol(srv, "after-key") == b"after-value"


def test_pipelined_dispatch_overlapped_batches():
    """dispatch_read_blobs: batch N+1 dispatched BEFORE batch N's fetch
    (the sustained-QPS serving pattern), with a donating flush between the
    two dispatches and out-of-order fetches. Every response must decode
    bit-exactly — in-flight programs must survive both the overlap and
    the DB donation."""
    import bz2

    from sdk_tpu.client import Client, reframe_decoded_row
    from sdk_tpu.kv.key_value import extract_result, row_from_key
    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_fast_expansion_testing_params()
    srv = SpiralKvServer(params, json.dumps(params_to_json_obj(params)))

    def write(kv: dict) -> None:
        srv.write_kv(json.dumps(
            {k: base64.b64encode(v).decode()
             for k, v in kv.items()}).encode())

    write({"pipe-key": b"pipe-value"})

    clients, blobs = [], []
    for i in range(4):
        c = Client(params)
        pp = c.generate_keys()
        uid = srv.setup_raw(pp.serialize(params))
        q = c.generate_query(row_from_key(params.num_items(), "pipe-key"))
        clients.append(c)
        blobs.append(uid.encode() + q.serialize(params))

    def check(c: Client, resp: bytes) -> None:
        row = reframe_decoded_row(params, c.decode_response(resp))
        payload = bz2.BZ2Decompressor().decompress(row)
        assert extract_result("pipe-key", payload) == b"pipe-value"

    # depth-2 pipeline: A, B in flight together; write+flush (donating
    # scatter) lands between the dispatches; B fetched before A
    fetch_a = srv.dispatch_read_blobs(blobs[:2])
    write({"churn": b"x" * 32})           # flush donates the DB buffer
    fetch_b = srv.dispatch_read_blobs(blobs[2:])
    resp_b = fetch_b()
    resp_a = fetch_a()
    for i, r in enumerate(resp_a):
        check(clients[i], r)
    for i, r in enumerate(resp_b):
        check(clients[2 + i], r)

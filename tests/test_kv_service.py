"""KV plane + HTTP service + client SDK tests.

- key->row golden values from the reference (key_value.rs:92-98)
- row payload splice/update/delete round trips (write.rs semantics)
- hermetic e2e: real HTTP server (sdk_tpu.server.http) + real client SDK
  (sdk_tpu.clients) over localhost — the reference's e2e-tests/main.ts
  pattern, with deterministic key->value hashing like
  python/tests/test_service.py.
"""

import hashlib
import json
import socket
import threading

import numpy as np
import pytest

from sdk_tpu.kv.key_value import extract_result, row_from_key
from sdk_tpu.kv.write import compress_row, unwrap_kv_pairs, update_row
from sdk_tpu.params import get_fast_expansion_testing_params, params_to_json_obj


def test_row_from_key_goldens():
    # reference config: nu_1=9, nu_2=5 -> 2^14 items (key_value.rs:71-98)
    assert row_from_key(1 << 14, "CA") == 4825
    assert row_from_key(1 << 14, "OR") == 8359


def test_update_row_insert_replace_delete():
    row = bytearray()
    update_row(row, "alpha", b"first")
    update_row(row, "beta", b"second")
    assert extract_result("alpha", bytes(row)) == b"first"
    assert extract_result("beta", bytes(row)) == b"second"

    update_row(row, "alpha", b"replaced-longer-value")
    assert extract_result("alpha", bytes(row)) == b"replaced-longer-value"
    assert extract_result("beta", bytes(row)) == b"second"

    update_row(row, "alpha", b"")      # delete
    with pytest.raises(KeyError):
        extract_result("alpha", bytes(row))
    assert extract_result("beta", bytes(row)) == b"second"


def test_unwrap_kv_pairs():
    import base64

    body = json.dumps({"k1": base64.b64encode(b"v1").decode(), "k2": None}).encode()
    pairs = dict(unwrap_kv_pairs(body))
    assert pairs["k1"] == b"v1"
    assert pairs["k2"] == b""


def key_to_gold_value(key: str, size: int = 80) -> bytes:
    """Deterministic key->value hashing (test_service.py:11-18 pattern)."""
    out = bytearray()
    cur = key.encode()
    while len(out) < size:
        cur = hashlib.sha256(cur).digest()
        out.extend(cur)
    return bytes(out[:size])


@pytest.fixture(scope="module")
def live_server():
    from sdk_tpu.server.http import serve
    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_fast_expansion_testing_params()
    srv = SpiralKvServer(params, json.dumps(params_to_json_obj(params)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    httpd = serve(srv, port, block=False)
    yield port
    httpd.shutdown()


def test_http_e2e_write_read(live_server):
    from sdk_tpu.clients.bucket_service import connect_local

    port = live_server
    bucket = connect_local(port)
    keys = ["CA", "OR", "hello-world"]
    bucket.write({k: key_to_gold_value(k) for k in keys})

    got = bucket.private_read(["CA", "hello-world"])
    assert got[0] == key_to_gold_value("CA")
    assert got[1] == key_to_gold_value("hello-world")

    # absent key -> None
    assert bucket.private_read(["missing-key"]) == [None]


def test_http_e2e_delete_and_update(live_server):
    from sdk_tpu.clients.bucket_service import connect_local

    port = live_server
    bucket = connect_local(port)
    bucket.write({"temp-key": b"ephemeral", "keep-key": b"stays"})
    assert bucket.private_read(["temp-key"]) == [b"ephemeral"]

    bucket.delete_key("temp-key")
    assert bucket.private_read(["temp-key"]) == [None]
    assert bucket.private_read(["keep-key"]) == [b"stays"]

    bucket.write({"keep-key": b"updated"})
    assert bucket.private_read(["keep-key"]) == [b"updated"]


def test_http_meta_version_increments(live_server):
    from sdk_tpu.clients.api import API

    api = API("", f"http://localhost:{live_server}")
    v0 = api.meta()["global_version"]
    api.write("", {"vkey": "dGVzdA=="})
    v1 = api.meta()["global_version"]
    assert v1 == v0 + 1


@pytest.fixture(scope="module")
def live_server_direct():
    """Direct-upload (no expansion keys) server — the public params ride
    along with every query (bin/server.rs:123-137)."""
    from sdk_tpu.params import get_no_expansion_testing_params
    from sdk_tpu.server.http import serve
    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_no_expansion_testing_params()
    # item bytes must be ingestible: p=65536 is not the logp=8 fast path;
    # use a logp=8 direct-upload config instead
    from sdk_tpu.params import params_from_json

    params = params_from_json(
        '{"direct_upload": 1, "n": 2, "nu_1": 4, "nu_2": 2, "p": 256,'
        ' "q2_bits": 20, "t_gsw": 8, "t_conv": 4, "t_exp_left": 8,'
        ' "t_exp_right": 8}')
    srv = SpiralKvServer(params)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    httpd = serve(srv, port, block=False)
    yield port
    httpd.shutdown()


def test_http_e2e_direct_upload(live_server_direct):
    from sdk_tpu.clients.bucket_service import connect_local

    bucket = connect_local(live_server_direct)
    assert not bucket.params.expand_queries
    bucket.write({"du-key": b"direct upload works"})
    assert bucket.private_read(["du-key"]) == [b"direct upload works"]


def test_warmup_precompiles_serving_path():
    """srv.warmup() runs one synthetic protocol round through the real read
    path (same jitted program as live traffic — writes landed first so the
    sparse/dense variant matches serving), leaves no session behind, and
    the bucket serves correctly afterwards."""
    import base64

    from sdk_tpu.server.kv_server import SpiralKvServer
    from tests.util_protocol import read_via_protocol

    params = get_fast_expansion_testing_params()
    srv = SpiralKvServer(params, json.dumps(params_to_json_obj(params)))
    srv.write_kv(json.dumps(
        {"wk": base64.b64encode(b"warm value").decode()}).encode())
    dt = srv.warmup()
    assert dt > 0
    assert not srv.pub_params          # throwaway session removed
    assert read_via_protocol(srv, "wk") == b"warm value"

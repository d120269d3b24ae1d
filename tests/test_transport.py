"""Transport-layer parity (VERDICT r1 item 7): the presigned-upload flow
for large payloads (reference api.rs:149-186 / js api.ts:303-324 — prelim
{"length": N} -> presigned URL -> multipart POST) and the APIGW size
switch (python/blyss/api.py:32)."""

import json
import socket

import pytest

from sdk_tpu.clients import api as apimod
from sdk_tpu.clients.api import API, ApiError
from sdk_tpu.params import get_fast_expansion_testing_params, params_to_json_obj


def free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def http_server():
    from sdk_tpu.server.http import serve
    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_fast_expansion_testing_params()
    srv = SpiralKvServer(params, json.dumps(params_to_json_obj(params)))
    port = free_port()
    httpd = serve(srv, port, block=False)
    yield port, srv
    httpd.shutdown()


def test_presigned_setup_roundtrip(http_server):
    from sdk_tpu.clients.bucket_service import connect_local

    port, _ = http_server
    bucket = connect_local(port)
    bucket.write({"big-setup": b"presigned ok"})

    # route this client's setup through the presigned flow explicitly
    pp_bytes = bucket._generate_keys()
    bucket._pp_bytes = pp_bytes
    uid = bucket._api.setup_presigned("", pp_bytes)
    bucket._public_uuid = uid
    assert bucket._api.check(uid)
    assert bucket.private_read(["big-setup"]) == [b"presigned ok"]


def test_setup_switches_to_presigned_over_limit(http_server, monkeypatch):
    from sdk_tpu.clients.bucket_service import connect_local

    port, _ = http_server
    # drop the threshold below the real setup size: API.setup must take the
    # presigned path on its own
    monkeypatch.setattr(apimod, "APIGW_MAX_SIZE", 1024)
    bucket = connect_local(port)
    bucket.write({"auto-presigned": b"switched"})
    assert bucket.private_read(["auto-presigned"]) == [b"switched"]


def test_presigned_upload_failure_modes(http_server):
    port, _ = http_server
    api = API("", f"http://localhost:{port}")

    # unknown token -> 404
    with pytest.raises(ApiError) as ei:
        api._post_form_data(f"http://localhost:{port}/upload/deadbeef",
                            {"key": "deadbeef"}, b"xx")
    assert ei.value.code == 404

    # length mismatch -> 400 (and the token is consumed)
    r = api._post(api.endpoint + "/setup",
                  json.dumps({"length": 999}).encode(), compress=False)
    with pytest.raises(ApiError) as ei:
        api._post_form_data(api.endpoint + r["url"], r["fields"], b"short")
    assert ei.value.code == 400

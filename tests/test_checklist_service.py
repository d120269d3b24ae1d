"""DoublePIR checklist service e2e (reference call stack SURVEY 3.4:
Bucket.checkInclusion -> bloom indices -> batched DoublePIR -> >= 5 of 8
bits) plus the Spiral /bloom route + private_key_intersect."""

import json
import socket

import numpy as np
import pytest

from sdk_tpu.params import get_fast_expansion_testing_params, params_to_json_obj


def free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def checklist_server():
    from sdk_tpu.doublepir.params import Params
    from sdk_tpu.server.doublepir_server import (DoublePirKvServer,
                                                 serve_doublepir)

    # 2^16-bit bloom DB: small but realistic shape
    srv = DoublePirKvServer(log2m=16)
    srv.add_keys([f"breached-password-{i}" for i in range(50)])
    assert srv.warmup() > 0   # pre-compile; the tests below assert that
    port = free_port()        # serving-after-warmup stays correct
    httpd = serve_doublepir(srv, port, block=False)
    yield port
    httpd.shutdown()


def test_check_inclusion_e2e(checklist_server):
    from sdk_tpu.clients.api import API
    from sdk_tpu.clients.bucket import Bucket

    bucket = Bucket(API("", f"http://localhost:{checklist_server}"))
    assert bucket.scheme == "doublepir"
    assert bucket.check_inclusion("breached-password-7") is True
    assert bucket.check_inclusion("breached-password-49") is True
    assert bucket.check_inclusion("safe-password-xyz") is False

    # spiral ops must be refused on a doublepir bucket
    with pytest.raises(RuntimeError):
        bucket._ensure_scheme("spiral")


@pytest.fixture(scope="module")
def spiral_server_bloom():
    from sdk_tpu.server.http import serve
    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_fast_expansion_testing_params()
    srv = SpiralKvServer(params, json.dumps(params_to_json_obj(params)),
                         key_storage_policy="full")
    port = free_port()
    httpd = serve(srv, port, block=False)
    yield port
    httpd.shutdown()


def test_private_key_intersect(spiral_server_bloom):
    from sdk_tpu.clients.bucket_service import connect_local

    bucket = connect_local(spiral_server_bloom)
    bucket.write({"alice": b"1", "bob": b"2", "carol": b"3"})
    got = bucket.private_key_intersect(["alice", "carol", "mallory", "trent"])
    assert sorted(got) == ["alice", "carol"]


def test_list_keys_and_clear(spiral_server_bloom):
    from sdk_tpu.clients.api import API

    api = API("", f"http://localhost:{spiral_server_bloom}")
    keys = api._get(api.endpoint + "/list-keys")
    assert "alice" in keys and "bob" in keys

    api._post(api.endpoint + "/clear", b"{}", compress=False)
    from sdk_tpu.clients.bucket_service import connect_local
    bucket = connect_local(spiral_server_bloom)
    assert bucket.private_read(["alice"]) == [None]

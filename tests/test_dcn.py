"""Multi-host DCN serving (sdk_tpu.server.dcn): instances sharded across
backend servers must produce byte-identical responses to a single server
holding all instances (the reference's independent-instances structure,
lib/server/src/server.rs:53-96)."""

import base64
import json
import socket

import numpy as np
import pytest

from sdk_tpu.client import Client
from sdk_tpu.params import params_from_json, params_from_json_obj
from sdk_tpu.rng import ChaCha20Rng
from sdk_tpu.server.dcn import (DcnFrontend, backend_params_obj,
                                response_segment_bytes, serve as dcn_serve)
from sdk_tpu.server.http import serve as http_serve
from sdk_tpu.server.kv_server import SpiralKvServer

PARAMS_JSON = ('{"n": 2, "nu_1": 6, "nu_2": 2, "p": 256, "q2_bits": 20,'
               ' "t_gsw": 8, "t_conv": 4, "t_exp_left": 8, "t_exp_right": 8,'
               ' "instances": 2, "db_item_size": 16384}')


def free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def topology():
    params = params_from_json(PARAMS_JSON)
    b_obj = backend_params_obj(params, 2)
    assert b_obj["instances"] == 1
    backends, urls, httpds = [], [], []
    for _ in range(2):
        srv = SpiralKvServer(params_from_json_obj(b_obj))
        port = free_port()
        httpds.append(http_serve(srv, port, block=False))
        backends.append(srv)
        urls.append(f"http://localhost:{port}")
    fe = DcnFrontend(params, urls, PARAMS_JSON)
    single = SpiralKvServer(params, PARAMS_JSON)
    yield params, fe, single, backends
    for h in httpds:
        h.shutdown()


def _client(params):
    c = Client(params)
    pp = c.generate_keys_from_seed(
        b"\x31" * 32, noise_rng=ChaCha20Rng(b"\x32" * 32),
        pp_seed=b"\x33" * 32)
    return c, pp.serialize(params)


def test_dcn_matches_single_server_byte_exact(topology):
    params, fe, single, backends = topology
    rng = np.random.default_rng(6)

    kv = {f"key-{i}": base64.b64encode(
        rng.integers(0, 256, 500, dtype=np.uint8).tobytes()).decode()
        for i in range(5)}
    body = json.dumps(kv).encode()
    fe.write_kv(body)
    single.write_kv(body)

    client, pp_raw = _client(params)
    uid = "11111111-2222-3333-4444-555555555555"
    fe.setup_raw(pp_raw, uid)
    single.setup_raw(pp_raw, uid)

    from sdk_tpu.kv.key_value import extract_result, row_from_key

    key = "key-3"
    row = row_from_key(params.num_items(), key)
    query = client.generate_query(
        row, noise_rng=ChaCha20Rng(b"\x38" * 32), query_seed=b"\x39" * 32)
    blob = uid.encode() + query.serialize(params)
    rd_body = json.dumps([base64.b64encode(blob).decode()]).encode()

    dcn_resp = json.loads(fe.private_read_body(rd_body))
    single_resp = json.loads(single.private_read(rd_body))
    assert dcn_resp == single_resp  # byte-identical splice

    import bz2 as _bz2

    decoded = client.decode_response(base64.b64decode(dcn_resp[0]))
    row_payload = _bz2.BZ2Decompressor().decompress(decoded)
    assert extract_result(key, row_payload) == base64.b64decode(kv[key])


def test_dcn_front_end_http_surface(topology):
    params, fe, single, backends = topology
    port = free_port()
    httpd = dcn_serve(fe, port, block=False)
    try:
        from sdk_tpu.clients.bucket_service import connect_local

        bucket = connect_local(port)
        assert bucket.info()["dcn_backends"] == 2
        bucket.write({"dcn-key": b"served across hosts"})
        assert bucket.private_read(["dcn-key"]) == [b"served across hosts"]
        assert bucket.private_read(["missing"]) == [None]
    finally:
        httpd.shutdown()


def test_dcn_presigned_setup(topology):
    params, fe, single, backends = topology
    port = free_port()
    httpd = dcn_serve(fe, port, block=False)
    try:
        from sdk_tpu.clients.api import API

        api = API("", f"http://localhost:{port}")
        _, pp_raw = _client(params)
        uid = api.setup_presigned("", pp_raw)
        assert fe.has_uuid(uid)
    finally:
        httpd.shutdown()


def test_dcn_backend_failure_and_resync():
    """Kill one backend: reads must fail with a clean 502 naming the dead
    URL (not a hang or a masked traceback). Restart it stateless, resync
    from the front end, and reads recover — no client round trip needed."""
    import urllib.error
    import urllib.request

    params = params_from_json(PARAMS_JSON)
    b_obj = backend_params_obj(params, 2)
    ports = [free_port(), free_port()]
    httpds = [
        http_serve(SpiralKvServer(params_from_json_obj(b_obj)), p,
                   block=False)
        for p in ports]
    urls = [f"http://localhost:{p}" for p in ports]
    fe = DcnFrontend(params, urls, PARAMS_JSON)
    fe_port = free_port()
    fe_httpd = dcn_serve(fe, fe_port, block=False)
    try:
        fe.write_kv(json.dumps(
            {"ha-key": base64.b64encode(b"survives restart").decode()}
        ).encode())
        client, pp_raw = _client(params)
        uid = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"
        fe.setup_raw(pp_raw, uid)

        from sdk_tpu.kv.key_value import extract_result, row_from_key

        row = row_from_key(params.num_items(), "ha-key")
        query = client.generate_query(
            row, noise_rng=ChaCha20Rng(b"\x58" * 32), query_seed=b"\x59" * 32)
        rd_body = json.dumps([base64.b64encode(
            uid.encode() + query.serialize(params)).decode()]).encode()

        def read_http():
            req = urllib.request.Request(
                f"http://localhost:{fe_port}/private-read", data=rd_body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=1200) as r:
                return json.loads(r.read())

        baseline = read_http()

        # kill backend 0
        httpds[0].shutdown()
        httpds[0].server_close()
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            read_http()
        assert exc_info.value.code == 502
        detail = json.loads(exc_info.value.read())
        assert urls[0] in detail["failed_backends"]
        assert urls[1] not in detail["failed_backends"]

        # restart it STATELESS on the same port and resync from the front end
        httpds[0] = http_serve(
            SpiralKvServer(params_from_json_obj(b_obj)), ports[0],
            block=False)
        fe.resync(0)
        recovered = read_http()
        assert recovered == baseline

        import bz2 as _bz2

        decoded = client.decode_response(base64.b64decode(recovered[0]))
        assert extract_result(
            "ha-key",
            _bz2.BZ2Decompressor().decompress(decoded)) == b"survives restart"
    finally:
        fe_httpd.shutdown()
        for h in httpds:
            h.shutdown()


def test_backend_params_and_segment_math():
    params = params_from_json(PARAMS_JSON)
    obj = backend_params_obj(params, 2)
    bp = params_from_json_obj(obj)
    assert bp.bytes_per_chunk() == params.bytes_per_chunk()
    seg = response_segment_bytes(params)
    # encode_response emits instances*seg bits (+ u64 padding)
    from sdk_tpu.arith import log2_ceil
    q1_bits = log2_ceil(4 * params.pt_modulus)
    want_bits = params.instances * (
        params.q2_bits * params.n * params.poly_len
        + q1_bits * params.n * params.n * params.poly_len)
    assert params.instances * seg * 8 == want_bits
    with pytest.raises(AssertionError):
        backend_params_obj(params, 3)


def test_dcn_checkpoint_restore_cold_deployment(topology, tmp_path):
    """Checkpoint the front end's KV plane, restore into a FRESH front end
    wired to FRESH empty backends: restore resyncs the backends from the
    checkpoint and a client retains its setup (same uuid) — the whole
    deployment cold-restarts with no client round trips."""
    params, fe, single, backends = topology
    rng = np.random.default_rng(9)

    kv = {f"ckpt-key-{i}": base64.b64encode(
        rng.integers(0, 256, 300, dtype=np.uint8).tobytes()).decode()
        for i in range(3)}
    fe.write_kv(json.dumps(kv).encode())
    client, pp_raw = _client(params)
    uid = "99999999-8888-7777-6666-555555555555"
    fe.setup_raw(pp_raw, uid)
    fe.save_to_dir(str(tmp_path / "dcn-ckpt"))

    # fresh empty backends + fresh front end
    b_obj = backend_params_obj(params, 2)
    httpds, urls = [], []
    for _ in range(2):
        srv = SpiralKvServer(params_from_json_obj(b_obj))
        port = free_port()
        httpds.append(http_serve(srv, port, block=False))
        urls.append(f"http://localhost:{port}")
    try:
        fe2 = DcnFrontend(params, urls, PARAMS_JSON)
        fe2.restore_from_dir(str(tmp_path / "dcn-ckpt"))
        assert fe2.has_uuid(uid), "client setup must survive the restart"

        from sdk_tpu.kv.key_value import extract_result, row_from_key

        key = "ckpt-key-1"
        row = row_from_key(params.num_items(), key)
        query = client.generate_query(
            row, noise_rng=ChaCha20Rng(b"\x3a" * 32), query_seed=b"\x3b" * 32)
        blob = uid.encode() + query.serialize(params)
        rd_body = json.dumps([base64.b64encode(blob).decode()]).encode()
        resp = json.loads(fe2.private_read_body(rd_body))

        import bz2 as _bz2

        decoded = client.decode_response(base64.b64decode(resp[0]))
        payload = _bz2.BZ2Decompressor().decompress(decoded)
        assert extract_result(key, payload) == base64.b64decode(kv[key])
    finally:
        for h in httpds:
            h.shutdown()

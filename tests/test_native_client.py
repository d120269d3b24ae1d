"""Native C++ client parity: byte-identical wire outputs vs the Python client
for identical params + seeds, matching the reference's three-client-stack
shape (Rust lib/blyss-rs + TS + Python; here C++ + TS + Python). Covers the
ctypes library (sdk_tpu/native/spiral_client.py), the offline CLI, and a live
HTTP private-read driven end-to-end by the native binary."""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

from sdk_tpu import poly, server_host
from sdk_tpu.client import Client
from sdk_tpu.params import (
    get_fast_expansion_testing_params,
    get_no_expansion_testing_params,
    params_to_json_obj,
)
from sdk_tpu.rng import ChaCha20Rng
from sdk_tpu.native import spiral_client as native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native spiral client unavailable")

SK = b"\x01" * 32
NOISE = b"\x02" * 32
PP_SEED = b"\x03" * 32
Q_NOISE = b"\x0c" * 32
Q_SEED = b"\x0d" * 32


def params_json(params) -> str:
    return json.dumps(params_to_json_obj(params))


def python_pp_query(params, idx):
    client = Client(params)
    pp = client.generate_keys_from_seed(
        SK, noise_rng=ChaCha20Rng(NOISE), pp_seed=PP_SEED)
    q = client.generate_query(
        idx, noise_rng=ChaCha20Rng(Q_NOISE), query_seed=Q_SEED)
    return client, pp, q


@pytest.mark.parametrize("params_fn", [get_fast_expansion_testing_params,
                                       get_no_expansion_testing_params])
def test_native_wire_bytes_match_python(params_fn):
    params = params_fn()
    idx = 37 % params.num_items()
    _, pp, q = python_pp_query(params, idx)

    nc = native.NativeSpiralClient(params_json(params))
    assert nc.generate_keys(SK, NOISE, PP_SEED) == bytes(pp.serialize(params))
    assert nc.generate_query(idx, Q_NOISE, Q_SEED) == bytes(q.serialize(params))


def test_native_decode_matches_python():
    params = get_fast_expansion_testing_params()
    idx = 37 % params.num_items()
    client, pp, q = python_pp_query(params, idx)

    corr_item, db = server_host.generate_random_db_and_get_item(params, idx)
    response = bytes(server_host.process_query(params, pp, q, db))

    nc = native.NativeSpiralClient(params_json(params))
    nc.generate_secret_keys(SK)
    native_out = nc.decode_response(response)
    python_out = client.decode_response(response)
    assert native_out == bytes(python_out)

    from sdk_tpu.arith import log2_ceil
    corr = poly.raw_to_bytes(params, corr_item, log2_ceil(params.pt_modulus),
                             params.modp_words_per_chunk())
    assert native_out == bytes(corr)


def test_native_cli_offline(tmp_path):
    exe = native.cli_path()
    assert exe is not None
    params = get_fast_expansion_testing_params()
    idx = 37 % params.num_items()
    client, pp, q = python_pp_query(params, idx)

    cfg = tmp_path / "params.json"
    cfg.write_text(params_json(params))
    hx = lambda b: b.hex()

    pp_f, q_f = tmp_path / "pp.bin", tmp_path / "q.bin"
    subprocess.run([exe, "keygen", str(cfg), hx(SK), hx(NOISE), hx(PP_SEED),
                    str(pp_f)], check=True, timeout=120)
    assert pp_f.read_bytes() == bytes(pp.serialize(params))

    subprocess.run([exe, "query", str(cfg), hx(SK), str(idx), hx(Q_NOISE),
                    hx(Q_SEED), str(q_f)], check=True, timeout=120)
    assert q_f.read_bytes() == bytes(q.serialize(params))

    corr_item, db = server_host.generate_random_db_and_get_item(params, idx)
    response = bytes(server_host.process_query(params, pp, q, db))
    resp_f, out_f = tmp_path / "resp.bin", tmp_path / "item.bin"
    resp_f.write_bytes(response)
    subprocess.run([exe, "decode", str(cfg), hx(SK), str(resp_f), str(out_f)],
                   check=True, timeout=120)
    assert out_f.read_bytes() == bytes(client.decode_response(response))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_native_cli_http_read(tmp_path):
    """The native binary drives the full live flow (setup -> private-read ->
    decode) against the HTTP server, like the reference's Rust client binary
    (lib/blyss-rs/src/bin/client.rs); Python plants the row and unwraps the
    natively-decoded bytes."""
    exe = native.cli_path()
    assert exe is not None
    params = get_fast_expansion_testing_params()
    cfg = tmp_path / "params.json"
    cfg.write_text(params_json(params))

    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SDK_TPU_FORCE_CPU"] = "1"
    proc = subprocess.Popen(
        [sys.executable, "-m", "sdk_tpu.server.http", str(port), str(cfg)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "Listening on" in line:
                break
        else:
            pytest.fail("server did not start")

        from sdk_tpu.clients.bucket_service import connect_local
        bucket = connect_local(port)
        bucket.write({"native-key": b"read by C++"})

        row_idx = bucket.get_row("native-key")
        out_f = tmp_path / "item.bin"
        subprocess.run(
            [exe, "read", f"localhost:{port}", str(cfg), "-", str(row_idx),
             str(out_f)], check=True, timeout=300)

        # unwrap the natively-decoded raw row exactly as the SDK does
        import bz2
        from sdk_tpu.client import reframe_decoded_row
        from sdk_tpu.kv.key_value import extract_result
        row = bz2.BZ2Decompressor().decompress(
            reframe_decoded_row(params, out_f.read_bytes()))
        assert extract_result("native-key", row) == b"read by C++"
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=10)

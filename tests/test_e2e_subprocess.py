"""Hermetic e2e with a real server subprocess (the reference's
e2e-tests/main.ts pattern: spawn the server binary, wait for "Listening on",
drive the SDK against it), plus failure-recovery behaviors."""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

from sdk_tpu.params import get_fast_expansion_testing_params, params_to_json_obj


def free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def server_proc(tmp_path_factory):
    params_file = tmp_path_factory.mktemp("cfg") / "params.json"
    params = get_fast_expansion_testing_params()
    params_file.write_text(json.dumps(params_to_json_obj(params)))
    port = free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SDK_TPU_FORCE_CPU"] = "1"
    proc = subprocess.Popen(
        [sys.executable, "-m", "sdk_tpu.server.http", str(port),
         str(params_file)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # wait for "Listening on" (main.ts:21-27 pattern)
    deadline = time.time() + 120
    while time.time() < deadline:
        line = proc.stdout.readline()
        if "Listening on" in line:
            break
    else:
        proc.kill()
        pytest.fail("server did not start")
    yield port, proc
    proc.send_signal(signal.SIGTERM)
    proc.wait(timeout=10)


def test_subprocess_e2e(server_proc):
    from sdk_tpu.clients.bucket_service import connect_local

    port, _ = server_proc
    bucket = connect_local(port)
    bucket.write({"spawned": b"server works"})
    assert bucket.private_read(["spawned"]) == [b"server works"]


def test_client_resetup_after_server_loses_uuid(server_proc):
    """If the server no longer has the client's public params (404 on the
    uuid), the client must transparently re-setup (reference
    bucket.ts:84-95, bucket.py:280-290)."""
    from sdk_tpu.clients.bucket_service import connect_local

    port, _ = server_proc
    bucket = connect_local(port)
    bucket.write({"resetup-key": b"still here"})
    assert bucket.private_read(["resetup-key"]) == [b"still here"]
    first_uuid = bucket._public_uuid
    # simulate server-side state loss: poison the client's uuid
    bucket._public_uuid = "00000000-0000-4000-8000-000000000000"
    assert bucket.private_read(["resetup-key"]) == [b"still here"]
    assert bucket._public_uuid != "00000000-0000-4000-8000-000000000000"
    assert bucket._public_uuid != first_uuid


def test_async_bucket(server_proc):
    import asyncio

    from sdk_tpu.clients.api import API
    from sdk_tpu.clients.async_bucket import AsyncBucket

    port, _ = server_proc
    bucket = AsyncBucket(API("", f"http://localhost:{port}"))

    async def run():
        await bucket.async_write({f"async-{i}": f"v{i}".encode()
                                  for i in range(10)})
        return await bucket.async_private_read(["async-3", "async-7"])

    got = asyncio.run(run())
    assert got == [b"v3", b"v7"]


def test_restore_warmup_cold_start(tmp_path):
    """The production cold-start flow: checkpoint a populated bucket, spawn
    a fresh server with --restore DIR --warmup, and read — the restored
    index serves bit-exactly and warmup ran before the socket opened."""
    import base64

    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_fast_expansion_testing_params()
    cfg = json.dumps(params_to_json_obj(params))
    src = SpiralKvServer(params, cfg)
    src.write_kv(json.dumps(
        {"ck": base64.b64encode(b"checkpointed value").decode()}).encode())
    ckpt = tmp_path / "ckpt"
    src.save_to_dir(str(ckpt))
    params_file = tmp_path / "params.json"
    params_file.write_text(cfg)

    port = free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SDK_TPU_FORCE_CPU"] = "1"
    proc = subprocess.Popen(
        [sys.executable, "-m", "sdk_tpu.server.http", str(port),
         str(params_file), "--restore", str(ckpt), "--warmup"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        saw_warmup = False
        deadline = time.time() + 900
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "Warmup complete" in line:
                saw_warmup = True
            if "Listening on" in line:
                break
        else:
            pytest.fail("restored server did not start")
        assert saw_warmup, "--warmup did not run before the socket opened"

        from sdk_tpu.clients.bucket_service import connect_local

        bucket = connect_local(port)
        assert bucket.private_read(["ck"]) == [b"checkpointed value"]
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=10)


def test_save_on_exit_sigterm(tmp_path):
    """--save-on-exit checkpoints the index on SIGTERM; a new server
    started with --restore serves the checkpointed key."""
    import base64

    params = get_fast_expansion_testing_params()
    cfg = json.dumps(params_to_json_obj(params))
    params_file = tmp_path / "params.json"
    params_file.write_text(cfg)
    ckpt = tmp_path / "ckpt"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SDK_TPU_FORCE_CPU"] = "1"
    base = dict(stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True, env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    port = free_port()
    proc = subprocess.Popen(
        [sys.executable, "-m", "sdk_tpu.server.http", str(port),
         str(params_file), "--save-on-exit", str(ckpt)], **base)
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            if "Listening on" in proc.stdout.readline():
                break
        else:
            pytest.fail("server did not start")
        from sdk_tpu.clients.bucket_service import connect_local

        bucket = connect_local(port)
        bucket.write({"durable": b"survives sigterm"})
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert (ckpt / "state.json").exists(), "SIGTERM did not checkpoint"

    # restore in-process and read back
    from sdk_tpu.server.kv_server import SpiralKvServer
    from tests.util_protocol import read_via_protocol

    srv = SpiralKvServer(params, cfg)
    srv.restore_from_dir(str(ckpt))
    assert read_via_protocol(srv, "durable") == b"survives sigterm"

"""Sharded serving through the serving plane (VERDICT r1 item 2):
multi-query batched scan over the 8-device CPU mesh must be bit-identical
to single-device batched serving; the HTTP server must serve bit-exact
reads from a sharded DB (SDK_TPU_MESH); the cross-request batching window
must coalesce concurrent /private-read requests into one engine pass; and
/modify + /destroy must round-trip.

Reference shapes: lib/server/src/server.rs:53-96 (per-instance parallel
serving), bin/server.rs routes."""

import base64
import concurrent.futures
import json
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from sdk_tpu import server_host
from sdk_tpu.client import Client, PublicParameters, Query
from sdk_tpu.ops.server_jax import SpiralServerJax
from sdk_tpu.ops.shard import make_mesh, mesh_from_spec
from sdk_tpu.params import (get_fast_expansion_testing_params,
                            params_to_json_obj)
from sdk_tpu.rng import ChaCha20Rng


def _mk_requests(params, idxs):
    """Deterministic (pp, query) pairs for a list of target rows."""
    reqs = []
    for k, idx in enumerate(idxs):
        client = Client(params)
        pp = client.generate_keys_from_seed(
            bytes([40 + k]) * 32, noise_rng=ChaCha20Rng(bytes([50 + k]) * 32),
            pp_seed=bytes([60 + k]) * 32)
        pp2 = PublicParameters.deserialize(params, pp.serialize(params))
        query = client.generate_query(
            idx, noise_rng=ChaCha20Rng(bytes([70 + k]) * 32),
            query_seed=bytes([80 + k]) * 32)
        q2 = Query.deserialize(params, query.serialize(params))
        reqs.append((pp2, q2))
    return reqs


def test_batched_sharded_matches_single_device():
    params = get_fast_expansion_testing_params()
    idxs = [3 % params.num_items(), 11 % params.num_items(),
            29 % params.num_items()]
    _, db = server_host.generate_random_db_and_get_item(params, idxs[0])

    single = SpiralServerJax(params)
    single.set_db_host_tensor(db)
    want = single.process_queries_batched(_mk_requests(params, idxs))

    mesh = make_mesh(8, dp=2)
    sharded = SpiralServerJax(params, mesh=mesh)
    sharded.set_db_host_tensor(db)
    got = sharded.process_queries_batched(_mk_requests(params, idxs))

    assert got == want


def test_mesh_from_spec():
    m = mesh_from_spec("dp=2,db=4")
    assert dict(m.shape) == {"dp": 2, "db": 4}
    m = mesh_from_spec("db=8")
    assert dict(m.shape) == {"dp": 1, "db": 8}
    m = mesh_from_spec("4")
    assert dict(m.shape) == {"dp": 1, "db": 4}
    with pytest.raises(ValueError):
        mesh_from_spec("tp=4")


# --- HTTP e2e over a sharded mesh with a batching window ---

def free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mesh_server(tmp_path_factory):
    params_file = tmp_path_factory.mktemp("cfg") / "params.json"
    params = get_fast_expansion_testing_params()
    params_file.write_text(json.dumps(params_to_json_obj(params)))
    port = free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SDK_TPU_FORCE_CPU"] = "1"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["SDK_TPU_MESH"] = "dp=2,db=4"
    proc = subprocess.Popen(
        [sys.executable, "-m", "sdk_tpu.server.http", str(port),
         str(params_file), "--batch-window-ms", "400"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    deadline = time.time() + 120
    while time.time() < deadline:
        line = proc.stdout.readline()
        if "Listening on" in line:
            break
    else:
        proc.kill()
        pytest.fail("mesh server did not start")
    yield port, proc
    proc.send_signal(signal.SIGTERM)
    proc.wait(timeout=10)


def test_http_sharded_reads_and_coalescing(mesh_server):
    from sdk_tpu.clients.bucket_service import connect_local

    port, _ = mesh_server
    bucket = connect_local(port)
    kv = {f"shard-{i}": f"value-{i}".encode() for i in range(4)}
    bucket.write(kv)

    # warm the batched pipeline (first compile happens under the window)
    assert bucket.private_read(["shard-0"]) == [b"value-0"]

    # concurrent independent clients: each its own Bucket (own keys/uuid),
    # all issued inside one window -> one coalesced engine pass
    buckets = [connect_local(port) for _ in range(3)]
    for b in buckets:
        b.setup()   # do setup outside the timed window

    def read_one(i):
        return buckets[i].private_read([f"shard-{i + 1}"])[0]

    with concurrent.futures.ThreadPoolExecutor(3) as ex:
        got = list(ex.map(read_one, range(3)))
    assert got == [b"value-1", b"value-2", b"value-3"]

    with urllib.request.urlopen(f"http://localhost:{port}/metrics") as r:
        m = json.loads(r.read())
    stats = m["read_coalescer"]
    assert stats["requests"] >= 4
    # at least two of the three concurrent reads landed in one batch
    assert stats["max_batch"] >= 2


def test_http_modify_and_destroy(mesh_server):
    from sdk_tpu.clients.bucket_service import connect_local

    port, _ = mesh_server
    bucket = connect_local(port)
    bucket.rename("renamed-bucket")
    with urllib.request.urlopen(f"http://localhost:{port}/meta") as r:
        assert json.loads(r.read())["name"] == "renamed-bucket"

    bucket.destroy_entire_bucket()
    try:
        urllib.request.urlopen(f"http://localhost:{port}/meta")
        assert False, "destroyed bucket still serves /meta"
    except urllib.error.HTTPError as e:
        assert e.code == 404

"""Live-service API tests (reference e2e-tests/api.ts and
python/tests/test_service.py): CRUD + read-after-write/delete against a
DEPLOYED endpoint, with deterministic key -> gold-value hashing.

Set SDK_TPU_ENDPOINT (e.g. "http://my-host:8008") and optionally
SDK_TPU_API_KEY to run; skipped otherwise (the hermetic local-subprocess
equivalent lives in test_kv_service.py / test_e2e_subprocess.py).
"""

import hashlib
import os
import uuid

import pytest

ENDPOINT = os.environ.get("SDK_TPU_ENDPOINT")

pytestmark = pytest.mark.skipif(
    not ENDPOINT, reason="SDK_TPU_ENDPOINT not set — no deployed service")


def key_to_gold_value(key: str, size: int = 80) -> bytes:
    out = bytearray()
    cur = key.encode()
    while len(out) < size:
        cur = hashlib.sha256(cur).digest()
        out.extend(cur)
    return bytes(out[:size])


@pytest.fixture(scope="module")
def bucket():
    from sdk_tpu.clients.bucket_service import BucketService

    svc = BucketService(os.environ.get("SDK_TPU_API_KEY", ""), ENDPOINT)
    b = svc.connect("")
    b.setup()
    return b


def test_live_crud_read_after_write(bucket):
    run = uuid.uuid4().hex[:8]
    keys = [f"live-{run}-{i}" for i in range(4)]
    bucket.write({k: key_to_gold_value(k) for k in keys})

    got = bucket.private_read(keys[:2])
    assert got == [key_to_gold_value(k) for k in keys[:2]]

    # overwrite + read-after-write
    bucket.write({keys[0]: b"updated-" + run.encode()})
    assert bucket.private_read([keys[0]]) == [b"updated-" + run.encode()]

    # delete + read-after-delete
    bucket.delete_key(keys[1])
    assert bucket.private_read([keys[1]]) == [None]

    # untouched neighbor unaffected
    assert bucket.private_read([keys[2]]) == [key_to_gold_value(keys[2])]


def test_live_absent_key(bucket):
    assert bucket.private_read([f"never-written-{uuid.uuid4().hex}"]) == [None]


def test_live_meta_and_version(bucket):
    info = bucket.info()
    assert "pir_scheme" in info
    v0 = info["global_version"]
    bucket.write({f"ver-{uuid.uuid4().hex[:8]}": b"x"})
    assert bucket.info()["global_version"] > v0

"""Private Merkle-proof lookups (reference lib/blyss-rs/src/proof.rs):
build a tree, store subtrees + identity index in a real bucket over HTTP,
privately fetch a proof, and verify it hashes to the root."""

import hashlib
import json
import socket

import pytest

from sdk_tpu.clients import proof as proofmod
from sdk_tpu.clients.proof import LookupCfg, ProofStep
from sdk_tpu.params import get_fast_expansion_testing_params, params_to_json_obj


def h2(a: str, b: str) -> str:
    return "0x" + hashlib.sha256(bytes.fromhex(a[2:]) + bytes.fromhex(b[2:])).hexdigest()


def verify_proof(leaf: str, proof: list[ProofStep], root: str):
    cur = leaf
    for step in proof:
        cur = h2(step.value, cur) if step.pos == 0 else h2(cur, step.value)
    assert cur == root


TREE_HEIGHT = 7      # 64 leaves
SUBTREE_HEIGHT = 3
CAP_HEIGHT = 3


@pytest.fixture(scope="module")
def tree_bucket():
    from sdk_tpu.server.http import serve
    from sdk_tpu.server.kv_server import SpiralKvServer
    from sdk_tpu.clients.bucket_service import connect_local

    leaves = ["0x" + hashlib.sha256(f"leaf{i}".encode()).hexdigest()
              for i in range(1 << (TREE_HEIGHT - 1))]
    levels = proofmod.build_tree_levels(leaves, h2)

    cfg = LookupCfg(bucket_url="", api_key="", cap_url="",
                    subtree_height=SUBTREE_HEIGHT, cap_height=CAP_HEIGHT,
                    tree_height=TREE_HEIGHT)
    # cap: top CAP_HEIGHT levels, level order
    cap = proofmod.subtree_level_order(levels, 0, 0, CAP_HEIGHT)

    # bucket contents: subtrees "{level}-{idx}" + identity -> index
    kv = {}
    cur_level = TREE_HEIGHT - SUBTREE_HEIGHT
    while cur_level >= CAP_HEIGHT - 1:
        for idx in range(1 << cur_level):
            key = f"{cur_level}-{idx}"
            kv[key] = json.dumps(proofmod.subtree_level_order(
                levels, cur_level, idx, SUBTREE_HEIGHT)).encode()
        if cur_level >= SUBTREE_HEIGHT:
            cur_level -= SUBTREE_HEIGHT - 1
        else:
            break
    for i, leaf in enumerate(leaves):
        kv[leaf] = json.dumps(i).encode()

    params = get_fast_expansion_testing_params()
    srv = SpiralKvServer(params, json.dumps(params_to_json_obj(params)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    httpd = serve(srv, port, block=False)
    bucket = connect_local(port)
    bucket.write(kv)
    yield bucket, cfg, cap, leaves, levels
    httpd.shutdown()


def test_private_merkle_proof(tree_bucket):
    bucket, cfg, cap, leaves, levels = tree_bucket
    root = levels[0][0]
    for target in (5, 17, 62):
        proof = proofmod.private_fetch_merkle_proof(
            bucket, cfg, leaves[target], cap)
        assert len(proof) == TREE_HEIGHT - 1
        verify_proof(leaves[target], proof, root)


def test_unknown_identity_raises(tree_bucket):
    bucket, cfg, cap, leaves, levels = tree_bucket
    with pytest.raises(KeyError):
        proofmod.private_fetch_merkle_proof(
            bucket, cfg, "0x" + "ab" * 32, cap)

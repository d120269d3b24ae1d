"""Private Merkle-proof demo (reference lib/blyss-rs/src/proof.rs): fetch a
membership proof from a bucket of subtrees without revealing which leaf.

Run: python examples/python/merkle_proof_demo.py
"""

import hashlib
import json
import socket
import sys

sys.path.insert(0, ".")


def h2(a: str, b: str) -> str:
    return "0x" + hashlib.sha256(
        bytes.fromhex(a[2:]) + bytes.fromhex(b[2:])).hexdigest()


def main():
    from sdk_tpu.clients import proof as proofmod
    from sdk_tpu.clients.proof import LookupCfg
    from sdk_tpu.clients.bucket_service import connect_local
    from sdk_tpu.params import get_fast_expansion_testing_params, params_to_json_obj
    from sdk_tpu.server.http import serve
    from sdk_tpu.server.kv_server import SpiralKvServer

    TREE_H, SUB_H, CAP_H = 7, 3, 3
    leaves = ["0x" + hashlib.sha256(f"identity-{i}".encode()).hexdigest()
              for i in range(1 << (TREE_H - 1))]
    levels = proofmod.build_tree_levels(leaves, h2)
    cfg = LookupCfg("", "", "", SUB_H, CAP_H, TREE_H)
    cap = proofmod.subtree_level_order(levels, 0, 0, CAP_H)

    kv = {}
    cur = TREE_H - SUB_H
    while cur >= CAP_H - 1:
        for idx in range(1 << cur):
            kv[f"{cur}-{idx}"] = json.dumps(
                proofmod.subtree_level_order(levels, cur, idx, SUB_H)).encode()
        if cur >= SUB_H:
            cur -= SUB_H - 1
        else:
            break
    for i, leaf in enumerate(leaves):
        kv[leaf] = json.dumps(i).encode()

    params = get_fast_expansion_testing_params()
    srv = SpiralKvServer(params, json.dumps(params_to_json_obj(params)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    serve(srv, port, block=False)
    bucket = connect_local(port)
    bucket.write(kv)
    print(f"stored a {len(leaves)}-leaf Merkle tree in the bucket")

    target = leaves[42]
    proof = proofmod.private_fetch_merkle_proof(bucket, cfg, target, cap)
    cur_hash = target
    for step in proof:
        cur_hash = h2(step.value, cur_hash) if step.pos == 0 \
            else h2(cur_hash, step.value)
    root = levels[0][0]
    print(f"privately fetched a {len(proof)}-step proof for leaf 42;"
          f" verifies to root: {cur_hash == root}")


if __name__ == "__main__":
    main()

"""Generate golden-vector fixtures for the TypeScript SDK (js/tests/fixtures).

Every fixture is produced by the Python implementation, which is itself
bit-exact against the numpy host oracle and byte-compatible with the
reference wire formats (tests/test_goldens.py, tests/test_client.py). The
jest suite replays them, pinning the TS port to the same bytes.

Run from the repo root:  python tools/gen_ts_fixtures.py
"""

from __future__ import annotations

import base64
import bz2
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdk_tpu import poly, server_host
from sdk_tpu.bitpack import varint_encode
from sdk_tpu.client import Client, PublicParameters, Query
from sdk_tpu.clients.bloom import BloomFilter, bloom_hash
from sdk_tpu.clients.serializer import serialize_chunks
from sdk_tpu.discrete_gaussian import DiscreteGaussian
from sdk_tpu.doublepir import scheme as dp_scheme
from sdk_tpu.doublepir.client import DoublePirClient
from sdk_tpu.doublepir.database import Db, DbInfo
from sdk_tpu.doublepir.matrix import SEEDS_SHORT, derive_aes_bytes, derive_from_seed
from sdk_tpu.doublepir.params import Params as DpParams
from sdk_tpu.doublepir.serializer import serialize_state, serialize_states
from sdk_tpu.kv.key_value import row_from_key
from sdk_tpu.ntt_host import ntt_forward, ntt_inverse
from sdk_tpu.params import get_fast_expansion_testing_params
from sdk_tpu.rng import ChaCha20Rng

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "js", "tests", "fixtures")

# every Python source whose change can alter wire bytes; their combined
# hash is baked into fixtures/meta.json, and tests/test_ts_fixtures.py
# fails when the fixtures go stale relative to these files
WIRE_SOURCES = [
    "sdk_tpu/arith.py",
    "sdk_tpu/bitpack.py",
    "sdk_tpu/client.py",
    "sdk_tpu/clients/bloom.py",
    "sdk_tpu/clients/serializer.py",
    "sdk_tpu/discrete_gaussian.py",
    "sdk_tpu/doublepir/database.py",
    "sdk_tpu/doublepir/matrix.py",
    "sdk_tpu/doublepir/params.py",
    "sdk_tpu/doublepir/scheme.py",
    "sdk_tpu/doublepir/serializer.py",
    "sdk_tpu/kv/key_value.py",
    "sdk_tpu/kv/write.py",
    "sdk_tpu/ntt_host.py",
    "sdk_tpu/params.py",
    "sdk_tpu/poly.py",
    "sdk_tpu/rng.py",
    "sdk_tpu/server_host.py",
]


def wire_sources_hash() -> str:
    h = hashlib.sha256()
    for rel in WIRE_SOURCES:
        with open(os.path.join(REPO, rel), "rb") as f:
            h.update(rel.encode())
            h.update(f.read())
    return h.hexdigest()


def w(name: str, obj) -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(obj, f, indent=1)
    print("wrote", name)


def sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def main() -> None:
    # --- chacha20 ---
    seed = bytes(range(32))
    rng = ChaCha20Rng(seed)
    u64s = [str(int(x)) for x in rng.next_u64(16)]
    rng2 = ChaCha20Rng(seed)
    raw = rng2.fill_bytes(64)
    w("chacha20.json", {"seed_hex": seed.hex(), "u64": u64s,
                        "bytes64_hex": raw.hex()})

    # --- discrete gaussian ---
    params = get_fast_expansion_testing_params()
    dg = DiscreteGaussian(6.4)
    rng = ChaCha20Rng(b"\x07" * 32)
    samples = [str(int(x)) for x in dg.sample_arr(params.modulus, rng, 64)]
    w("gaussian.json", {"seed_hex": (b"\x07" * 32).hex(),
                        "modulus": str(params.modulus), "samples": samples})

    # --- bloom / kv / varint / chunk framing ---
    bf = BloomFilter.empty(3, 10)
    for k in ["alpha", "beta", "gamma"]:
        bf.insert(k)
    w("data.json", {
        "bloom_indices": {k: [bloom_hash(k, i, 20) for i in range(8)]
                          for k in ["alpha", "some-key"]},
        "bloom_bytes_hex": bf.to_bytes().hex(),
        "bloom_lookup": {k: bf.lookup(k)
                         for k in ["alpha", "beta", "gamma", "delta"]},
        "row_from_key": {k: row_from_key(256, k)
                         for k in ["alpha", "beta", "the-key", "z"]},
        "varint": {str(v): varint_encode(v).hex()
                   for v in [0, 1, 127, 128, 300, 2 ** 21, 2 ** 40]},
        "chunks_hex": serialize_chunks([b"abc", b"", b"hello world"]).hex(),
    })

    # --- ntt (fast params moduli) ---
    rng = ChaCha20Rng(b"\x21" * 32)
    raw_poly = (rng.next_u64(params.poly_len) % np.uint64(params.modulus))
    ntt_in = np.stack([raw_poly % np.uint64(q) for q in params.moduli], axis=0)
    fwd = ntt_forward(params, ntt_in[None, :, :])[0]
    inv = ntt_inverse(params, fwd[None, :, :])[0]
    w("ntt.json", {
        "seed_hex": (b"\x21" * 32).hex(),
        "raw_sha256": sha(raw_poly.astype("<u8").tobytes()),
        "fwd_sha256": sha(fwd.astype("<u8").tobytes()),
        "fwd_first8": [[str(int(x)) for x in fwd[c][:8]] for c in range(2)],
        "inv_matches_input": bool((inv == ntt_in).all()),
    })

    # --- spiral: full client key/query/decode pins ---
    client = Client(params)
    pp = client.generate_keys_from_seed(
        b"\x11" * 32, noise_rng=ChaCha20Rng(b"\x12" * 32), pp_seed=b"\x13" * 32)
    pp_bytes = pp.serialize(params)
    target_idx = 37
    query = client.generate_query(
        target_idx, noise_rng=ChaCha20Rng(b"\x18" * 32), query_seed=b"\x19" * 32)
    q_bytes = query.serialize(params)

    corr_item, db = server_host.generate_random_db_and_get_item(params, target_idx)
    response = server_host.process_query(
        params, PublicParameters.deserialize(params, pp_bytes),
        Query.deserialize(params, q_bytes), db)
    decoded = client.decode_response(response)

    from sdk_tpu.arith import log2_ceil
    p_bits = log2_ceil(params.pt_modulus)
    corr = poly.raw_to_bytes(params, corr_item, p_bits,
                             params.modp_words_per_chunk())
    assert decoded == corr

    w("spiral.json", {
        "params_json": json.dumps({
            "n": 2, "nu_1": 6, "nu_2": 2, "p": 256, "q2_bits": 20,
            "t_gsw": 8, "t_conv": 4, "t_exp_left": 8, "t_exp_right": 8,
            "instances": 1, "db_item_size": 8192}),
        "secret_seed_hex": (b"\x11" * 32).hex(),
        "noise_seed_hex": (b"\x12" * 32).hex(),
        "pp_seed_hex": (b"\x13" * 32).hex(),
        "setup_bytes": params.setup_bytes(),
        "query_bytes": params.query_bytes(),
        "pp_sha256": sha(pp_bytes),
        "pp_head_hex": pp_bytes[:64].hex(),
        "pp_tail_hex": pp_bytes[-64:].hex(),
        "target_idx": target_idx,
        "query_noise_seed_hex": (b"\x18" * 32).hex(),
        "query_seed_hex": (b"\x19" * 32).hex(),
        "query_sha256": sha(q_bytes),
        "query_b64": base64.b64encode(q_bytes).decode(),
        "response_b64": base64.b64encode(response).decode(),
        "decoded_sha256": sha(decoded),
        "decoded_len": len(decoded),
    })

    # --- bz2 ---
    payloads = [b"hello bzip2 world", b"a" * 1000,
                bytes(np.random.default_rng(5).integers(0, 256, 5000,
                                                        dtype=np.uint8))]
    w("bz2.json", [{"compressed_b64":
                    base64.b64encode(bz2.compress(p) + b"\x00" * 7).decode(),
                    "plain_b64": base64.b64encode(p).decode()}
                   for p in payloads])

    # --- doublepir: derivation goldens + a full recover case ---
    deriv = derive_aes_bytes(SEEDS_SHORT[0], 128)
    dparams = DpParams(n=32, sigma=6.4, l=12, m=12, logq=32, p=929)
    rng_np = np.random.default_rng(11)
    nbits = dparams.l * dparams.m
    bits = rng_np.integers(0, 2, nbits, dtype=np.uint64)
    db = Db.from_entries(nbits, 1, dparams, [int(b) for b in bits])
    info = db.info
    shared = dp_scheme.init(info, dparams)
    server_state, hint = dp_scheme.setup(db, shared, dparams)
    a1_small = derive_from_seed(dparams.m, dparams.n, SEEDS_SHORT[0])
    s_vec = np.arange(1, dparams.n + 1, dtype=np.uint32).reshape(-1, 1)
    a1s = (a1_small.astype(np.uint64) @ s_vec.astype(np.uint64)) & np.uint64(0xFFFFFFFF)

    target = 17
    state, msg = dp_scheme.query(target, shared, dparams, info,
                                 np.random.default_rng(3))
    answer = dp_scheme.answer(db, [msg], server_state, dparams)
    got = dp_scheme.recover(target, 0, hint, msg, answer, shared, state,
                            dparams, info)
    assert got == int(bits[target]), (got, int(bits[target]))

    from sdk_tpu.doublepir.debug import checksum_u32

    w("doublepir.json", {
        # the same named XOR fingerprints sdk_tpu.doublepir.debug /
        # js/src/doublepir/debug.ts print (reference matrix.rs:176-196):
        # the TS suite recomputes them from the deserialized fixture
        # matrices — any Python/TS state divergence flips a checksum
        "checksums": {
            "query1": checksum_u32(msg[0]),
            "query2": checksum_u32(msg[1]),
            "hint_h2": checksum_u32(hint[0]),
            "answer_h1": checksum_u32(answer[0]),
            "answer_a2": checksum_u32(answer[1]),
            "answer_h2": checksum_u32(answer[2]),
        },
        "derive_seed1_first128_hex": deriv.hex(),
        "derive_matvec": {
            "rows": dparams.m, "cols": dparams.n,
            "s": [int(x) for x in s_vec[:, 0]],
            "out": [str(int(x)) for x in a1s[:, 0]],
        },
        "params_str": dparams.to_string(),
        "dbinfo_str": info.to_string(),
        "hint_b64": base64.b64encode(serialize_state(hint)).decode(),
        "client_data_b64": base64.b64encode(
            serialize_states([state, msg])).decode(),
        "answer_b64": base64.b64encode(serialize_state(answer)).decode(),
        "target_index": target,
        "expected_bit": int(bits[target]),
        "matrix_roundtrip_hex": serialize_state(
            [np.arange(6, dtype=np.uint32).reshape(2, 3)]).hex(),
    })

    # --- freshness pin: hash of every wire-touching Python source ---
    w("meta.json", {"wire_sources_sha256": wire_sources_hash(),
                    "wire_sources": WIRE_SOURCES})


if __name__ == "__main__":
    main()

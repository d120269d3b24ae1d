"""General plaintext-modulus ingestion (p != 256): logp-bit fields read from
each chunk's little-endian bitstream, mirroring read_arbitrary_bits
(reference util.rs:289-303 — the reference's own loader asserts p == 256,
loading.rs:289; this is an extension), plus the decode-side re-framing that
inverts raw_to_bytes' per-poly floor alignment."""

import base64
import json

import numpy as np
import pytest

from sdk_tpu.bitpack import read_arbitrary_bits
from sdk_tpu.client import Client, reframe_decoded_row
from sdk_tpu.kv.ingest import (chunk_bytes_to_modp_words,
                               convert_chunks_to_ntt, ingest_items_device)
from sdk_tpu.kv.key_value import extract_result, row_from_key
from sdk_tpu.params import params_from_json
from sdk_tpu.rng import ChaCha20Rng
from sdk_tpu.server.kv_server import SpiralKvServer

# fast p=512 config (logp=9, the reference DEFAULT_PARAMS plaintext modulus)
P512_JSON = ('{"n": 2, "nu_1": 6, "nu_2": 2, "p": 512, "q2_bits": 21,'
             ' "t_gsw": 10, "t_conv": 4, "t_exp_left": 16, "t_exp_right": 16,'
             ' "instances": 1, "db_item_size": 9216}')


@pytest.mark.parametrize("p", [16, 512, 65536])
def test_chunk_bytes_to_modp_words_matches_bitstream(p):
    params = params_from_json(P512_JSON)
    params.pt_modulus = p
    logp = int(np.log2(p))
    # item capacity scales with logp (instances * n^2 * poly_len * logp / 8)
    params.db_item_size = (params.instances * params.n * params.n
                           * params.poly_len * logp) // 8
    rng = np.random.default_rng(3)
    rows = rng.integers(0, 256, (3, params.bytes_per_chunk()), dtype=np.uint8)
    got = chunk_bytes_to_modp_words(params, rows)
    logp = int(np.log2(p))
    for r in range(rows.shape[0]):
        data = rows[r].tobytes()
        for i in range(params.modp_words_per_chunk()):
            want = read_arbitrary_bits(
                data + b"\x00" * 16, i * logp, logp)
            assert int(got[r, i]) == want, (r, i)


def test_device_ingest_matches_host_p512():
    import jax
    import jax.numpy as jnp

    params = params_from_json(P512_JSON)
    rng = np.random.default_rng(4)
    n_chunks = params.instances * params.n * params.n
    data = rng.integers(0, 256, n_chunks * params.bytes_per_chunk(),
                        dtype=np.uint8).tobytes()
    want = convert_chunks_to_ntt(params, data)
    raw = np.frombuffer(data, dtype=np.uint8).reshape(
        1, n_chunks, params.bytes_per_chunk())
    got = np.asarray(jax.jit(
        lambda rb: ingest_items_device(params, rb))(jnp.asarray(raw)))[0]
    np.testing.assert_array_equal(got, want)


def test_full_kv_round_trip_p512():
    params = params_from_json(P512_JSON)
    srv = SpiralKvServer(params)

    value = np.random.default_rng(5).integers(
        0, 256, 700, dtype=np.uint8).tobytes()
    key = "p512-key"
    srv.write_kv(json.dumps(
        {key: base64.b64encode(value).decode()}).encode())

    client = Client(params)
    pp = client.generate_keys_from_seed(
        b"\x21" * 32, noise_rng=ChaCha20Rng(b"\x22" * 32),
        pp_seed=b"\x23" * 32)
    uid = srv.setup_raw(pp.serialize(params))
    row = row_from_key(params.num_items(), key)
    query = client.generate_query(
        row, noise_rng=ChaCha20Rng(b"\x28" * 32), query_seed=b"\x29" * 32)
    resp = srv.private_read_one(uid.encode() + query.serialize(params))

    decoded = reframe_decoded_row(params, client.decode_response(resp))
    import bz2

    payload = bz2.BZ2Decompressor().decompress(decoded)
    assert extract_result(key, payload) == value

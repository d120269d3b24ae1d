"""Batched query serving: one DB scan amortized over many queries."""

import numpy as np
import pytest

from sdk_tpu import poly, server_host
from sdk_tpu.arith import log2_ceil
from sdk_tpu.client import Client, PublicParameters, Query
from sdk_tpu.ops.server_jax import SpiralServerJax
from sdk_tpu.params import get_fast_expansion_testing_params
from sdk_tpu.rng import ChaCha20Rng

RNG = np.random.default_rng(17)


def test_batched_queries_decode():
    params = get_fast_expansion_testing_params()
    clients, pps, queries, targets = [], [], [], [5, 99, 200]
    for i, t in enumerate(targets):
        c = Client(params)
        pp = c.generate_keys_from_seed(
            bytes([0x40 + i]) * 32, noise_rng=ChaCha20Rng(bytes([0x50 + i]) * 32),
            pp_seed=bytes([0x60 + i]) * 32)
        q = c.generate_query(t, noise_rng=ChaCha20Rng(bytes([0x70 + i]) * 32),
                             query_seed=bytes([0x80 + i]) * 32)
        clients.append(c)
        pps.append(PublicParameters.deserialize(params, pp.serialize(params)))
        queries.append(Query.deserialize(params, q.serialize(params)))

    # one DB; each query targets its own item
    items_dbs = [server_host.generate_random_db_and_get_item(params, t, seed=3)
                 for t in targets]
    db = items_dbs[0][1]
    srv = SpiralServerJax(params)
    srv.set_db_host_tensor(db)

    responses = srv.process_queries_batched(list(zip(pps, queries)))
    p_bits = log2_ceil(params.pt_modulus)
    for i, t in enumerate(targets):
        got = clients[i].decode_response(responses[i])
        want = poly.raw_to_bytes(params, items_dbs[i][0], p_bits,
                                 params.modp_words_per_chunk())
        assert got == want, f"query {i} (target {t})"


def test_batched_direct_upload_queries_decode():
    """The no-expansion (direct-upload) batched path: generic staged tail
    (per-query query_to_device, shared scan, vmapped pack+encode) must
    decode every query bit-exactly."""
    from sdk_tpu.params import get_no_expansion_testing_params

    params = get_no_expansion_testing_params()
    targets = [1 % params.num_items(), 7 % params.num_items()]
    clients, pps, queries = [], [], []
    for i, t in enumerate(targets):
        c = Client(params)
        pp = c.generate_keys_from_seed(
            bytes([0x41 + i]) * 32,
            noise_rng=ChaCha20Rng(bytes([0x51 + i]) * 32),
            pp_seed=bytes([0x61 + i]) * 32)
        q = c.generate_query(t, noise_rng=ChaCha20Rng(bytes([0x71 + i]) * 32),
                             query_seed=bytes([0x81 + i]) * 32)
        clients.append(c)
        pps.append(PublicParameters.deserialize(params, pp.serialize(params)))
        queries.append(Query.deserialize(params, q.serialize(params)))

    items_dbs = [server_host.generate_random_db_and_get_item(params, t, seed=5)
                 for t in targets]
    srv = SpiralServerJax(params)
    srv.set_db_host_tensor(items_dbs[0][1])

    responses = srv.process_queries_batched(list(zip(pps, queries)))
    p_bits = log2_ceil(params.pt_modulus)
    for i, t in enumerate(targets):
        got = clients[i].decode_response(responses[i])
        want = poly.raw_to_bytes(params, items_dbs[i][0], p_bits,
                                 params.modp_words_per_chunk())
        assert got == want, f"direct-upload query {i} (target {t})"

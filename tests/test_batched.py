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


def _make_sessions(params, targets, seed_base=0x40):
    clients, pps, queries = [], [], []
    for i, t in enumerate(targets):
        c = Client(params)
        pp = c.generate_keys_from_seed(
            bytes([seed_base + i]) * 32,
            noise_rng=ChaCha20Rng(bytes([seed_base + 16 + i]) * 32),
            pp_seed=bytes([seed_base + 32 + i]) * 32)
        q = c.generate_query(
            t, noise_rng=ChaCha20Rng(bytes([seed_base + 48 + i]) * 32),
            query_seed=bytes([seed_base + 64 + i]) * 32)
        clients.append(c)
        pps.append(PublicParameters.deserialize(params, pp.serialize(params)))
        queries.append(Query.deserialize(params, q.serialize(params)))
    return clients, pps, queries


def test_batch_pad_pow2_bounds_retraces():
    """Batched reads pad NQ to the next power of two with repeats of
    request 0, so a sweep of batch sizes compiles at most log2(NQ_max)
    distinct programs — and every response is byte-identical to the
    unpadded batch (the filler pattern of the reference's DoublePIR
    client, lib/doublepir/src/doublepir/client.rs:174-213)."""
    import jax

    params = get_fast_expansion_testing_params()
    targets = [5, 99, 200, 17, 42, 7, 123]
    clients, pps, queries = _make_sessions(params, targets)
    item, db = server_host.generate_random_db_and_get_item(params, 5, seed=3)
    reqs = list(zip(pps, queries))

    srv = SpiralServerJax(params)
    srv.set_db_host_tensor(db)
    srv.batch_pad_pow2 = False
    base = {nq: srv.process_queries_batched(reqs[:nq]) for nq in (2, 3)}

    srv2 = SpiralServerJax(params)
    srv2.set_db_host_tensor(db)
    assert srv2.batch_pad_pow2  # default on
    srv2._jit_full_b = jax.jit(srv2._full_batched_impl)
    sweep = (2, 3, 5, 6, 7)
    for nq in sweep:
        got = srv2.process_queries_batched(reqs[:nq])
        assert len(got) == nq
        if nq in base:
            assert got == base[nq], f"padding changed responses at NQ={nq}"
    # padded sizes are {2, 4, 8}: 3 programs for 5 distinct batch sizes
    assert srv2._jit_full_b._cache_size() <= 3, \
        srv2._jit_full_b._cache_size()
    # and the padded batch still decodes (the real-correctness check)
    got = srv2.process_queries_batched(reqs[:5])
    p_bits = log2_ceil(params.pt_modulus)
    want0 = poly.raw_to_bytes(params, item, p_bits,
                              params.modp_words_per_chunk())
    assert clients[0].decode_response(got[0]) == want0


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

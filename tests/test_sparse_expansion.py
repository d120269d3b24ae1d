"""Compacted sparse query expansion (reference per-round skip sets,
lib/server/src/compute/query_expansion.rs:213-248): responses must be
byte-identical to dense expansion and the host oracle when the DB rows
outside the populated set are zero."""

import numpy as np
import pytest

from sdk_tpu import poly, server_host
from sdk_tpu.arith import log2_ceil
from sdk_tpu.client import Client, PublicParameters, Query
from sdk_tpu.ops import spiral_jax as sj
from sdk_tpu.ops.server_jax import SpiralServerJax
from sdk_tpu.params import get_fast_expansion_testing_params
from sdk_tpu.rng import ChaCha20Rng

from test_spiral_jax import seeded_client

U64 = np.uint64

POP_ITEMS = [5, 6, 7, 37, 100, 200]


def _sparse_db(params, seed=7):
    """Items tensor: zero everywhere except POP_ITEMS."""
    rng = np.random.default_rng(seed)
    instances, trials = params.instances, params.n * params.n
    items = np.zeros((instances, trials, params.num_items(), params.poly_len),
                     dtype=U64)
    for idx in POP_ITEMS:
        items[:, :, idx] = rng.integers(
            0, params.pt_modulus, (instances, trials, params.poly_len),
            dtype=U64)
    return items, server_host.build_db_tensor(params, items)


def _query_for(params, client, idx):
    return Query.deserialize(params, client.generate_query(
        idx, noise_rng=ChaCha20Rng(bytes([0x18 + idx % 7]) * 32),
        query_seed=bytes([0x19 + idx % 5]) * 32).serialize(params))


def test_sparse_expansion_matches_dense_and_oracle():
    params = get_fast_expansion_testing_params()
    client, pp = seeded_client(params)
    pp2 = PublicParameters.deserialize(params, pp.serialize(params))
    items, db = _sparse_db(params)
    dim0_set = {i >> params.db_dim_2 for i in POP_ITEMS}

    srv = SpiralServerJax(params)
    srv.set_db_host_tensor(db)

    target = 37
    query = _query_for(params, client, target)
    dense = srv.process_query(pp2, query)
    assert dense == server_host.process_query(params, pp2, query, db)

    srv.set_populated_dim0(dim0_set)
    assert srv._splan is not None
    sparse = srv.process_query(pp2, query)
    assert sparse == dense

    # the read decodes to the planted item
    result = client.decode_response(sparse)
    item = np.zeros((params.instances * params.n, params.n, params.poly_len),
                    dtype=U64)
    for instance in range(params.instances):
        for trial in range(params.n * params.n):
            item[instance * params.n + trial // params.n, trial % params.n] = \
                items[instance, trial, target]
    p_bits = log2_ceil(params.pt_modulus)
    corr = poly.raw_to_bytes(params, item, p_bits, params.modp_words_per_chunk())
    assert result == corr

    # an unpopulated index behaves identically under both expansions
    q_miss = _query_for(params, client, 43)
    srv.set_populated_dim0(None)
    dense_miss = srv.process_query(pp2, q_miss)
    srv.set_populated_dim0(dim0_set)
    assert srv.process_query(pp2, q_miss) == dense_miss


def test_sparse_expansion_batched_matches_dense():
    """The fused BATCHED read with a sparse plan installed
    (_full_batched_sparse_impl: vmapped _expand_sparse_flat_impl into the
    flat pad-free query carrier, shared scan, per-query folds) must be
    byte-identical to dense batched serving and decode every query."""
    params = get_fast_expansion_testing_params()
    items, db = _sparse_db(params)
    dim0_set = {i >> params.db_dim_2 for i in POP_ITEMS}
    # one populated hit, one miss, one more hit — three distinct clients
    targets = [37, 43, 200]
    clients, pps, queries = [], [], []
    for i, t in enumerate(targets):
        c = Client(params)
        pp = c.generate_keys_from_seed(
            bytes([0x42 + i]) * 32,
            noise_rng=ChaCha20Rng(bytes([0x52 + i]) * 32),
            pp_seed=bytes([0x62 + i]) * 32)
        clients.append(c)
        pps.append(PublicParameters.deserialize(params, pp.serialize(params)))
        queries.append(_query_for(params, c, t))

    srv = SpiralServerJax(params)
    srv.set_db_host_tensor(db)
    dense = srv.process_queries_batched(list(zip(pps, queries)))

    srv.set_populated_dim0(dim0_set)
    assert srv._splan is not None
    sparse = srv.process_queries_batched(list(zip(pps, queries)))
    assert sparse == dense

    p_bits = log2_ceil(params.pt_modulus)
    for i, t in enumerate(targets):
        result = clients[i].decode_response(sparse[i])
        item = np.zeros(
            (params.instances * params.n, params.n, params.poly_len),
            dtype=U64)
        for instance in range(params.instances):
            for trial in range(params.n * params.n):
                item[instance * params.n + trial // params.n,
                     trial % params.n] = items[instance, trial, t]
        corr = poly.raw_to_bytes(params, item, p_bits,
                                 params.modp_words_per_chunk())
        assert result == corr, f"query {i} (target {t})"


def test_sparse_plan_capacities_shrink_work():
    params = get_fast_expansion_testing_params()
    right = params.t_gsw * params.db_dim_2
    splan = sj.SparseExpansionPlan(
        params, {i >> params.db_dim_2 for i in POP_ITEMS}, right)
    g = params.g()
    dense_updates = sum(2 ** (r + 1) for r in range(g))
    sparse_updates = sum(r["cap_e"] + r["cap_o"] for r in splan.rounds)
    assert sparse_updates < dense_updates / 2
    # late rounds (where dense work concentrates) must be capped near the
    # populated count, not 2^r
    last = splan.rounds[-1]
    assert last["cap_e"] + last["cap_o"] <= 4 * (len(POP_ITEMS) + right)


def test_sparse_plan_rejects_full_and_empty():
    params = get_fast_expansion_testing_params()
    srv = SpiralServerJax(params)
    srv.set_populated_dim0(set())
    assert srv._splan is None
    srv.set_populated_dim0(set(range(1 << params.db_dim_1)))
    assert srv._splan is None

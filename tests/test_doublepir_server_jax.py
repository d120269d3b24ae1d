"""ChecklistServerJax (device-resident DoublePIR server) vs the host scheme.

Every matrix the device produces — squished H1, client hint H2, and the
full answer State — must be word-for-word equal to scheme.setup/answer on
the same DB (reference doublepir.rs:76-350), and recover must return the
planted bit values through the real client.
"""

import numpy as np
import pytest

from sdk_tpu.doublepir import scheme
from sdk_tpu.doublepir.client import DoublePirClient
from sdk_tpu.doublepir.database import Db, DbInfo
from sdk_tpu.doublepir.params import Params
from sdk_tpu.doublepir.server_jax import ChecklistServerJax

# small checklist-style config: p=464 makes 1-bit entries byte-packed
# (packing=8, ne=x=1) exactly like the production deployment
PARAMS = Params(n=64, sigma=6.4, l=13, m=17, logq=32, p=464)


def _shared(params, rng):
    """Small random shared matrices (same shapes scheme.init derives)."""
    a_1 = rng.integers(0, 1 << 32, (params.m, params.n),
                       dtype=np.uint64).astype(np.uint32)
    a_2 = rng.integers(0, 1 << 32, (params.l, params.n),
                       dtype=np.uint64).astype(np.uint32)
    return [a_1, a_2]


@pytest.fixture(scope="module")
def setup_pair():
    params = PARAMS
    num_entries = params.l * params.m * 8 - 5   # exercise the byte tail
    rng = np.random.default_rng(3)
    bit_bytes = rng.integers(0, 256, (num_entries + 7) // 8,
                             dtype=np.uint16).astype(np.uint8)
    shared = _shared(params, rng)

    host_db = Db.from_packed_bits(num_entries, params, bit_bytes)
    info = host_db.info
    server_state, hint = scheme.setup(host_db, shared, params)

    srv = ChecklistServerJax(num_entries, params, bit_bytes)
    hint_dev = srv.setup(shared)
    return (params, info, num_entries, bit_bytes, shared, host_db,
            server_state, hint, srv, hint_dev)


def test_setup_matches_host(setup_pair):
    (_, _, _, _, _, _, server_state, hint, srv, hint_dev) = setup_pair
    np.testing.assert_array_equal(np.asarray(srv.h1_sq), server_state[0])
    np.testing.assert_array_equal(srv.a_2_t, server_state[1])
    np.testing.assert_array_equal(hint_dev[0], hint[0])


def test_answer_matches_host_and_recovers(setup_pair):
    (params, info, num_entries, bit_bytes, shared, host_db,
     server_state, hint, srv, hint_dev) = setup_pair
    rng = np.random.default_rng(7)

    # pick targets with known bit values (planted 1s and 0s)
    all_bits = np.unpackbits(bit_bytes, bitorder="little")[:num_entries]
    ones = np.flatnonzero(all_bits == 1)
    zeros = np.flatnonzero(all_bits == 0)
    targets = [int(ones[0]), int(zeros[0]), int(ones[-1]), int(zeros[-1])]

    client = DoublePirClient(params, info, shared)
    client.hint = hint_dev
    queries, states = [], []
    for t in targets:
        st, msg = scheme.query(t, shared, params, info, rng)
        states.append(st)
        queries.append(msg)

    host_msg = scheme.answer(host_db, queries, server_state, params)
    dev_msg = srv.answer(queries)
    assert len(dev_msg) == len(host_msg)
    for h, d in zip(host_msg, dev_msg):
        np.testing.assert_array_equal(d, h)

    for b, t in enumerate(targets):
        got = scheme.recover(t, b, hint_dev, queries[b], dev_msg, shared,
                             states[b], params, info)
        assert got == int(all_bits[t]), (b, t)


def test_rejects_non_checklist_config():
    params = Params(n=64, sigma=6.4, l=16, m=16, logq=32, p=991)
    # p=991 -> 9 bits packing, not the byte-element case
    with pytest.raises(ValueError):
        ChecklistServerJax(100, params, np.zeros(13, dtype=np.uint8))


def test_sharded_checklist_answer_bit_exact(setup_pair):
    """Row-sharded ChecklistServerJax over a 4-device "db" mesh: hint and
    answers byte-identical to the single-device server (the reference
    chunk-and-sum pattern, bin/e2e.rs:60-106, as exact mod-2^32 psum over
    the mesh). l=13 over 4 shards pads to 24 rows — the pad-row masking in
    setup and the zero-contribution pad rows in the answer are both
    load-bearing here."""
    (params, info, num_entries, bit_bytes, shared, host_db,
     server_state, hint, srv, hint_dev) = setup_pair

    from sdk_tpu.ops.shard import make_mesh

    mesh = make_mesh(4)
    srv_sh = ChecklistServerJax(num_entries, params, bit_bytes, mesh=mesh)
    hint_sh = srv_sh.setup(shared)
    np.testing.assert_array_equal(hint_sh[0], hint_dev[0])
    # squished H1 agrees on the real (unpadded) packed columns
    l3 = -(-params.l // 3)
    np.testing.assert_array_equal(
        np.asarray(srv_sh.h1_sq)[:, :l3], np.asarray(srv.h1_sq)[:, :l3])

    rng = np.random.default_rng(23)
    all_bits = np.unpackbits(bit_bytes, bitorder="little")[:num_entries]
    targets = [int(np.flatnonzero(all_bits == 1)[1]),
               int(np.flatnonzero(all_bits == 0)[1])]
    queries, states = [], []
    for t in targets:
        st, msg = scheme.query(t, shared, params, info, rng)
        states.append(st)
        queries.append(msg)

    single_msg = srv.answer(queries)
    sharded_msg = srv_sh.answer(queries)
    assert len(sharded_msg) == len(single_msg)
    for s, d in zip(single_msg, sharded_msg):
        np.testing.assert_array_equal(d, s)

    for b, t in enumerate(targets):
        got = scheme.recover(t, b, hint_sh, queries[b], sharded_msg, shared,
                             states[b], params, info)
        assert got == int(all_bits[t]), (b, t)


def test_derive_rows_matches_full():
    """derive_from_seed_rows must return exactly the rows of the full
    derivation for arbitrary (unaligned) row offsets — the seekability the
    streamed setup rests on (reference derivation.rs:11-22 chunk IVs)."""
    from sdk_tpu.doublepir.matrix import (SEEDS_SHORT, derive_from_seed,
                                          derive_from_seed_rows)

    # 4099 cols * 4 B = 16396 B/row: rows straddle the 64 KiB chunking
    full = derive_from_seed(23, 4099, SEEDS_SHORT[0])
    for row0, nrows in ((0, 23), (1, 5), (17, 6), (22, 1)):
        np.testing.assert_array_equal(
            derive_from_seed_rows(row0, nrows, 4099, SEEDS_SHORT[0]),
            full[row0 : row0 + nrows])


def test_setup_streamed_matches_scheme(setup_pair):
    """setup_streamed (chunked AES derive -> device accumulate) must
    produce the identical hint state as setup(scheme.init(...)) — the
    production preprocess path with the REAL public matrices."""
    (params, info, num_entries, bit_bytes, *_rest) = setup_pair

    host_db = Db.from_packed_bits(num_entries, params, bit_bytes)
    shared = scheme.init(info, params)
    server_state, hint = scheme.setup(host_db, shared, params)

    srv = ChecklistServerJax(num_entries, params, bit_bytes)
    # tiny chunks force many updates + a ragged tail through the stream
    hint_dev = srv.setup_streamed(chunk_bytes=params.n * 4 * 3)
    np.testing.assert_array_equal(np.asarray(srv.h1_sq), server_state[0])
    np.testing.assert_array_equal(hint_dev[0], hint[0])
    # the streamed A2 residency must serve answers identically: a2_pad_dev
    # row-padded to SQUISH_DELTA, equal to the host-derived A2
    a2 = shared[1]
    got = np.asarray(srv._a2_pad_dev)
    np.testing.assert_array_equal(got[: a2.shape[0]], a2)
    assert not got[a2.shape[0] :].any()

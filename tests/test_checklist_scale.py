"""Production-scale checklist plumbing (VERDICT r1 item 5): the bit-packed
bloom store and streamed Db build must be bit-exact vs the per-entry
reference path, and the chunked hint serving must reassemble to the full
hint. (Reference production config: js/bridge/src/doublepir_lib.rs:118-129,
packing=8, p=464.)"""

import numpy as np

from sdk_tpu.doublepir.database import Db, DbInfo
from sdk_tpu.doublepir.params import LOGQ, SEC_PARAM, Params, pick_params

RNG = np.random.default_rng(7)


def _rand_bits(n):
    bits = (RNG.random(n) < 0.03).astype(np.uint8)   # sparse, like a bloom
    packed = np.packbits(bits, bitorder="little")
    return bits, packed


def test_from_packed_bits_matches_from_entries_p9():
    n = 1 << 14
    params = pick_params(n, 1, SEC_PARAM, LOGQ, lower_bound_m=1)
    info = DbInfo.new(n, 1, params)
    assert info.packing == int(np.log2(params.p))   # odd packing path
    bits, packed = _rand_bits(n)
    a = Db.from_entries(n, 1, params, bits.tolist())
    b = Db.from_packed_bits(n, params, packed)
    np.testing.assert_array_equal(a.data, b.data)
    # element read-back round trip on set/unset bits
    hot = np.flatnonzero(bits)[:4]
    for i in hot:
        assert b.get_elem(int(i)) == 1
    assert b.get_elem(int(np.flatnonzero(bits == 0)[0])) == 0


def test_from_packed_bits_matches_from_entries_p8():
    # the production config's packing (p=464 -> 8 bits/element)
    n = 1 << 14
    params = Params(n=1024, sigma=6.4, l=64, m=32, logq=32, p=464)
    info = DbInfo.new(n, 1, params)
    assert info.packing == 8
    bits, packed = _rand_bits(n)
    a = Db.from_entries(n, 1, params, bits.tolist())
    b = Db.from_packed_bits(n, params, packed)
    np.testing.assert_array_equal(a.data, b.data)


def test_bitpacked_store_and_chunked_hint():
    from sdk_tpu.server.doublepir_server import (HINT_CHUNK_BYTES,
                                                 DoublePirKvServer)

    srv = DoublePirKvServer(log2m=13)
    srv.add_keys([f"k-{i}" for i in range(20)])
    # packed store: 2^13 bits = 1 KiB, not 8 KiB of uint8 flags
    assert srv.bit_bytes.nbytes == 1 << 10

    full = srv.get_hint()
    meta = srv.hint_meta()
    assert meta["hint_bytes"] == len(full)
    got = b"".join(srv.hint_chunk(i) for i in range(meta["hint_num_chunks"]))
    assert got == full
    if len(full) > HINT_CHUNK_BYTES:
        assert len(srv.hint_chunk(0)) == HINT_CHUNK_BYTES

    # direct bit ingestion (no key tracking) flips exactly one bit
    before = srv.bit_bytes.copy()
    srv.set_bit(4097)
    diff = np.flatnonzero(srv.bit_bytes != before)
    assert list(diff) in ([4097 >> 3], [])   # may already be set
    assert srv.bit_bytes[4097 >> 3] & (1 << (4097 & 7))

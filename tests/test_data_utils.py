"""Pure-data client utilities (reference js/tests/*.ts jest suite):
seed, serializer, varint, bloom round trips."""

import numpy as np
import pytest

from sdk_tpu.bitpack import varint_decode, varint_encode
from sdk_tpu.clients import seed as seedmod
from sdk_tpu.clients.bloom import BloomFilter
from sdk_tpu.clients.serializer import (deserialize_chunks, serialize_chunks,
                                        unwrap_key_val, wrap_key_val)


def test_seed_roundtrip():
    s = seedmod.get_random_seed()
    assert len(s) == seedmod.SEED_STR_LEN
    raw = seedmod.seed_from_string(s)
    assert seedmod.string_from_seed(raw) == s


def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 300, 2 ** 21, 2 ** 40, 2 ** 62]:
        enc = varint_encode(v)
        dec, n = varint_decode(enc)
        assert dec == v and n == len(enc)


def test_chunk_serializer_roundtrip():
    chunks = [b"", b"a", b"hello world", bytes(1000)]
    data = serialize_chunks(chunks)
    assert deserialize_chunks(data) == chunks


def test_wrap_key_val():
    data = wrap_key_val(b"key", b"value-bytes")
    k, v, consumed = unwrap_key_val(data)
    assert k == b"key" and v == b"value-bytes" and consumed == len(data)


def test_bloom_filter_roundtrip():
    bf = BloomFilter.empty(8, 12)
    for k in ["alpha", "beta", "gamma"]:
        bf.insert(k)
    raw = bf.to_bytes()
    bf2 = BloomFilter.from_bytes(raw)
    assert bf2.k == 8 and bf2.bits == 12
    for k in ["alpha", "beta", "gamma"]:
        assert bf2.lookup(k)
    assert not bf2.lookup("not-present-key-xyz")


def test_cli_e2e():
    from sdk_tpu.doublepir.cli import main

    assert main(["e2e", "12"]) == 0

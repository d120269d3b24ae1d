"""DoublePirClient/Server wrappers: serialization round trips, the
serialized-protocol e2e (PirServer/PirClient trait semantics), batch query
planning, and preprocessed-index save/restore."""

import numpy as np
import pytest

from sdk_tpu.doublepir.client import DoublePirClient
from sdk_tpu.doublepir.database import DbInfo
from sdk_tpu.doublepir.params import LOGQ, SEC_PARAM, Params, pick_params
from sdk_tpu.doublepir.serializer import (deserialize_state,
                                          deserialize_states,
                                          deserialize_dbinfo,
                                          serialize_dbinfo, serialize_state,
                                          serialize_states)
from sdk_tpu.doublepir.server import DoublePirServer

U32 = np.uint32
RNG = np.random.default_rng(13)


def test_state_serialization_roundtrip():
    s = [RNG.integers(0, 1 << 32, (10, 35), dtype=np.uint64).astype(U32),
         RNG.integers(0, 1 << 32, (7, 1), dtype=np.uint64).astype(U32),
         RNG.integers(0, 1 << 32, (1, 7), dtype=np.uint64).astype(U32)]
    b1 = serialize_state(s)
    s2, _ = deserialize_state(b1)
    b2 = serialize_state(s2)
    assert b1 == b2
    for a, b in zip(s, s2):
        np.testing.assert_array_equal(a, b)

    nested = serialize_states([s, s[:1]])
    back = deserialize_states(nested)
    assert len(back) == 2 and len(back[0]) == 3 and len(back[1]) == 1


def test_dbinfo_and_params_roundtrip():
    params = pick_params(1 << 14, 1, SEC_PARAM, LOGQ, lower_bound_m=1)
    info = DbInfo.new(1 << 14, 1, params)
    assert deserialize_dbinfo(serialize_dbinfo(info)) == info
    p2 = Params.from_string(params.to_string())
    assert p2 == params
    assert DbInfo.from_string(info.to_string()) == info


@pytest.fixture(scope="module")
def loaded_server():
    num_entries = 1 << 14
    params = pick_params(num_entries, 1, SEC_PARAM, LOGQ, lower_bound_m=1)
    srv = DoublePirServer(num_entries, 1, params)
    vals = RNG.integers(0, 2, num_entries, dtype=np.uint64)
    vals[777] = 1
    vals[778] = 0
    srv.load_data(vals.tolist())
    return srv, vals


def test_serialized_protocol_e2e(loaded_server):
    srv, vals = loaded_server
    client = DoublePirClient(srv.params, srv.db.info, srv.shared_state)
    client.load_hint(srv.get_hint())
    for idx in (777, 778):
        q_bytes, client_data = client.generate_query(idx, RNG)
        resp = srv.answer(serialize_states([deserialize_state(q_bytes)[0]]))
        got = client.decode_response(resp, idx, 0, client_data)
        assert got == int(vals[idx])


def test_batch_query_plan(loaded_server):
    srv, vals = loaded_server
    client = DoublePirClient(srv.params, srv.db.info, srv.shared_state)
    client.load_hint(srv.get_hint())
    n = srv.db.info.num_entries
    indices = [100, n // 2 + 5]
    queries, client_datas, plan = client.generate_query_batch(indices, RNG)
    assert len(queries) == 2
    resp = srv.answer(serialize_states(queries))
    for b, entry in enumerate(plan):
        if entry is None:
            continue
        idx = entry[0]
        got = client.decode_response(resp, idx, b, client_datas[b])
        assert got == int(vals[idx])


def test_save_restore_preprocessed_index(tmp_path, loaded_server):
    srv, vals = loaded_server
    base = str(tmp_path / "ckpt")
    srv.save_to_files(base)

    srv2 = DoublePirServer(srv.num_entries, 1, srv.params)
    srv2.restore_from_files(base)
    np.testing.assert_array_equal(srv2.db.data, srv.db.data)
    assert srv2.db.info == srv.db.info

    client = DoublePirClient(srv.params, srv2.db.info, srv.shared_state)
    client.load_hint(srv2.get_hint())
    q_bytes, client_data = client.generate_query(777, RNG)
    resp = srv2.answer(serialize_states([deserialize_state(q_bytes)[0]]))
    assert client.decode_response(resp, 777, 0, client_data) == int(vals[777])

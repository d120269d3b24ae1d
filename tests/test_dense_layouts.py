"""Dense DB storage profiles ("latency" separate limb planes vs
"throughput" limb-concat channels — ops/server_jax.db_tensor_to_device)
must be BYTE-IDENTICAL through every serving surface: the scan outputs are
the same exact mod-q integers in both layouts (identical int32 partial
sums, only regrouped), so responses, scatters, migrations and checkpoints
must agree word-for-word. Raced on v5e (tools/profile_scan_r32.py):
throughput wins the 16-query batched scan 1.6x, latency the single query
by ~10% — both serve either pattern correctly."""

from __future__ import annotations

import numpy as np

from sdk_tpu import server_host
from sdk_tpu.client import Client, PublicParameters, Query
from sdk_tpu.ops import spiral_jax as sj
from sdk_tpu.ops.server_jax import SpiralServerJax, db_tensor_to_device
from sdk_tpu.params import get_fast_expansion_testing_params
from sdk_tpu.rng import ChaCha20Rng


def _sessions(params, targets):
    clients, pps, queries = [], [], []
    for i, t in enumerate(targets):
        c = Client(params)
        pp = c.generate_keys_from_seed(
            bytes([0x30 + i]) * 32,
            noise_rng=ChaCha20Rng(bytes([0x40 + i]) * 32),
            pp_seed=bytes([0x50 + i]) * 32)
        q = c.generate_query(
            t, noise_rng=ChaCha20Rng(bytes([0x60 + i]) * 32),
            query_seed=bytes([0x70 + i]) * 32)
        clients.append(c)
        pps.append(PublicParameters.deserialize(params, pp.serialize(params)))
        queries.append(Query.deserialize(params, q.serialize(params)))
    return clients, pps, queries


def test_layouts_scan_word_exact():
    """firstdim_multiply over both dense layouts returns identical words
    (single-query and transposed batched carriers)."""
    import jax.numpy as jnp

    params = get_fast_expansion_testing_params()
    _, db = server_host.generate_random_db_and_get_item(params, 3, seed=9)
    lat = db_tensor_to_device(params, db, "latency")
    tp = db_tensor_to_device(params, db, "throughput")

    rng = np.random.default_rng(4)
    dim0 = 1 << params.db_dim_1
    for R in (2, 6):
        q_arr = jnp.asarray(np.stack(
            [rng.integers(0, q, (params.poly_len, dim0, R), dtype=np.uint32)
             for q in params.moduli]))
        np.testing.assert_array_equal(
            np.asarray(sj.firstdim_multiply(params, lat, q_arr)),
            np.asarray(sj.firstdim_multiply(params, tp, q_arr)))
        q_t = jnp.transpose(q_arr, (0, 1, 3, 2))
        np.testing.assert_array_equal(
            np.asarray(sj.firstdim_multiply_qT(params, lat, q_t)),
            np.asarray(sj.firstdim_multiply_qT(params, tp, q_t)))


def test_layouts_protocol_byte_identical():
    """Single-query and batched protocol responses agree byte-for-byte
    across dense layouts, and decode to the planted item."""
    params = get_fast_expansion_testing_params()
    targets = [5, 260, 17]
    clients, pps, queries = _sessions(params, targets)
    item, db = server_host.generate_random_db_and_get_item(params, 5, seed=2)

    servers = {}
    for layout in ("latency", "throughput"):
        srv = SpiralServerJax(params, dense_layout=layout)
        srv.set_db_host_tensor(db)
        servers[layout] = srv

    single = {lay: srv.process_query(pps[0], queries[0])
              for lay, srv in servers.items()}
    assert single["latency"] == single["throughput"]

    reqs = list(zip(pps, queries))
    batched = {lay: srv.process_queries_batched(reqs)
               for lay, srv in servers.items()}
    assert batched["latency"] == batched["throughput"]

    from sdk_tpu import poly
    from sdk_tpu.arith import log2_ceil

    p_bits = log2_ceil(params.pt_modulus)
    want = poly.raw_to_bytes(params, item, p_bits,
                             params.modp_words_per_chunk())
    assert clients[0].decode_response(batched["throughput"][0]) == want


def test_layouts_kv_flush_migrate_persist(tmp_path):
    """The kv write path (compact start -> flush -> dense migration) and
    checkpoint round-trips (including CROSS-LAYOUT restores) serve
    identical bytes in both dense layouts."""
    import base64
    import json

    from sdk_tpu.server.kv_server import SpiralKvServer

    params = get_fast_expansion_testing_params()
    kv = {f"k{i}": base64.b64encode(bytes([i]) * 24).decode()
          for i in range(40)}
    blob = json.dumps(kv).encode()

    srvs = {}
    for layout in ("latency", "throughput"):
        s = SpiralKvServer(params, dense_layout=layout)
        s.dense_migrate_fill = 0.0001   # force dense migration immediately
        s.write_kv(blob)
        srvs[layout] = s

    c = Client(params)
    pp = c.generate_keys_from_seed(
        b"\x21" * 32, noise_rng=ChaCha20Rng(b"\x22" * 32),
        pp_seed=b"\x23" * 32)
    from sdk_tpu.kv.key_value import row_from_key

    row = row_from_key(params.num_items(), "k7")
    qb = c.generate_query(
        row, noise_rng=ChaCha20Rng(b"\x24" * 32),
        query_seed=b"\x25" * 32).serialize(params)

    resps = {}
    for layout, s in srvs.items():
        uid = s.setup_raw(pp.serialize(params))
        resps[layout] = s.private_read_blobs([uid.encode() + qb])[0]
    assert resps["latency"] == resps["throughput"]

    # checkpoint in each layout, restore into a server of the OTHER layout
    for src, dst in (("latency", "throughput"), ("throughput", "latency")):
        d = tmp_path / f"ckpt_{src}"
        srvs[src].save_to_dir(str(d))
        s2 = SpiralKvServer(params, dense_layout=dst)
        s2.restore_from_dir(str(d))
        if dst == "throughput":
            # single-device flat channels: crt arrays, merged L*dim0 minor
            assert len(s2.engine.db) == params.crt_count
            assert s2.engine.db[0].shape[-1] == \
                sj.NUM_LIMBS * (1 << params.db_dim_1)
        else:
            assert len(s2.engine.db) == params.crt_count * sj.NUM_LIMBS
            assert s2.engine.db[0].shape[-1] == 1 << params.db_dim_1
        uid = s2.setup_raw(pp.serialize(params))
        assert s2.private_read_blobs([uid.encode() + qb])[0] == \
            resps["latency"], f"{src}->{dst}"

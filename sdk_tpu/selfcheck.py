"""Self-contained multi-chip correctness check.

Runs the FULL Spiral protocol (keygen -> query -> sharded expand/scan/fold/
pack/encode -> client decode) on an n-device mesh and asserts the response
bytes are identical to single-device serving AND that the client decodes the
planted item bit-exactly. This is the reference's chunk-and-reduce pattern
(lib/doublepir/src/bin/e2e.rs:92-106) realized as a real ICI collective
(exact mod-q psum over the "db" mesh axis, sdk_tpu.ops.shard.psum_mod).

Used by tests/test_sharded.py and by __graft_entry__.dryrun_multichip (the
driver's multi-chip validation artifact): a green run certifies the
collective, not just the tracer.
"""

from __future__ import annotations


def sharded_protocol_check(n_devices: int, dp: int | None = None) -> None:
    """Full-protocol sharded-vs-single bit-exactness on an n-device mesh.

    Raises AssertionError on any divergence. Requires a JAX backend that
    exposes at least n_devices devices.
    """
    from sdk_tpu import poly, server_host
    from sdk_tpu.arith import log2_ceil
    from sdk_tpu.client import Client, PublicParameters, Query
    from sdk_tpu.ops.server_jax import SpiralServerJax
    from sdk_tpu.ops.shard import make_mesh
    from sdk_tpu.params import get_fast_expansion_testing_params
    from sdk_tpu.rng import ChaCha20Rng

    params = get_fast_expansion_testing_params()
    trials = params.n * params.n
    if dp is None:
        # trials shard over "dp"; pick the largest dp that divides both.
        dp = 1
        for cand in (2, 4):
            if n_devices % cand == 0 and trials % cand == 0:
                dp = cand
    target_idx = 41 % params.num_items()

    client = Client(params)
    pp = client.generate_keys_from_seed(
        b"\x31" * 32, noise_rng=ChaCha20Rng(b"\x32" * 32),
        pp_seed=b"\x33" * 32)
    pp2 = PublicParameters.deserialize(params, pp.serialize(params))
    query = client.generate_query(
        target_idx, noise_rng=ChaCha20Rng(b"\x34" * 32),
        query_seed=b"\x35" * 32)
    q2 = Query.deserialize(params, query.serialize(params))
    item, db = server_host.generate_random_db_and_get_item(params, target_idx)

    single = SpiralServerJax(params)
    single.set_db_host_tensor(db)
    want = single.process_query(pp2, q2)

    mesh = make_mesh(n_devices, dp=dp)
    sharded = SpiralServerJax(params, mesh=mesh)
    sharded.set_db_host_tensor(db)
    got = sharded.process_query(pp2, q2)

    assert got == want, (
        "sharded response bytes differ from single-device serving")
    result = client.decode_response(got)
    p_bits = log2_ceil(params.pt_modulus)
    corr = poly.raw_to_bytes(params, item, p_bits,
                             params.modp_words_per_chunk())
    assert result == corr, "client decode mismatch after sharded serving"


def sharded_doublepir_check(n_devices: int) -> None:
    """DoublePIR checklist serving sharded over the "db" mesh axis:
    hint + full answer State bit-identical to the single-device server,
    planted bits recovered through the real client. Pads hard: l=13 over
    n shards exercises the pad-row masking (setup) and zero-contribution
    pad rows (answer)."""
    import numpy as np

    from sdk_tpu.doublepir import scheme
    from sdk_tpu.doublepir.params import Params
    from sdk_tpu.doublepir.server_jax import ChecklistServerJax
    from sdk_tpu.ops.shard import make_mesh

    params = Params(n=64, sigma=6.4, l=13, m=17, logq=32, p=464)
    num_entries = params.l * params.m * 8 - 5
    rng = np.random.default_rng(3)
    bit_bytes = rng.integers(0, 256, (num_entries + 7) // 8,
                             dtype=np.uint16).astype(np.uint8)
    a_1 = rng.integers(0, 1 << 32, (params.m, params.n),
                       dtype=np.uint64).astype(np.uint32)
    a_2 = rng.integers(0, 1 << 32, (params.l, params.n),
                       dtype=np.uint64).astype(np.uint32)
    shared = [a_1, a_2]

    single = ChecklistServerJax(num_entries, params, bit_bytes)
    hint_single = single.setup(shared)
    sharded = ChecklistServerJax(num_entries, params, bit_bytes,
                                 mesh=make_mesh(n_devices))
    hint_sharded = sharded.setup(shared)
    np.testing.assert_array_equal(hint_sharded[0], hint_single[0])

    # query noise rng + targets mirror test_doublepir_server_jax's known-
    # good draw: at these toy LWE dims (n=64) some noise draws exceed the
    # rounding budget even single-device, so the check pins a seed whose
    # single-device recover is verified below before blaming the collective
    qrng = np.random.default_rng(7)
    all_bits = np.unpackbits(bit_bytes, bitorder="little")[:num_entries]
    targets = [int(np.flatnonzero(all_bits == 1)[0]),
               int(np.flatnonzero(all_bits == 0)[0])]
    states, queries = [], []
    for t in targets:
        st, msg = scheme.query(t, shared, params, sharded.info, qrng)
        states.append(st)
        queries.append(msg)
    want = single.answer(queries)
    got = sharded.answer(queries)
    assert len(got) == len(want)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(g, w)
    for k, t in enumerate(targets):
        rec_single = scheme.recover(t, k, hint_single, queries[k], want,
                                    shared, states[k], params, single.info)
        assert rec_single == int(all_bits[t]), (
            "seed no longer decodes single-device (noise draw)", t,
            rec_single)
        rec = scheme.recover(t, k, hint_sharded, queries[k], got, shared,
                             states[k], params, sharded.info)
        assert rec == int(all_bits[t]), (t, rec)

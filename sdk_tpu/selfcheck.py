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

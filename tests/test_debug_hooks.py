"""CLIENT_TEST noise-localization hook (reference client.rs:15,
server.rs:713-729): the server decrypts the instance-0/trial-0 folded ct
mid-pipeline with a planted secret key and asserts the expected plaintext."""

import numpy as np
import pytest

from sdk_tpu import debug_hooks, server_host
from sdk_tpu.client import PublicParameters, Query
from sdk_tpu.ops.server_jax import SpiralServerJax
from sdk_tpu.params import get_fast_expansion_testing_params
from sdk_tpu.rng import ChaCha20Rng

from test_spiral_jax import seeded_client


@pytest.fixture(autouse=True)
def _clear_hook():
    yield
    debug_hooks.clear_client_test()


def _setup():
    params = get_fast_expansion_testing_params()
    target_idx = 37 % params.num_items()
    client, pp = seeded_client(params)
    query = client.generate_query(
        target_idx, noise_rng=ChaCha20Rng(b"\x18" * 32), query_seed=b"\x19" * 32)
    query2 = Query.deserialize(params, query.serialize(params))
    pp2 = PublicParameters.deserialize(params, pp.serialize(params))
    corr_item, db = server_host.generate_random_db_and_get_item(params, target_idx)
    return params, client, pp2, query2, corr_item, db


def test_client_test_hook_passes_and_localizes_failure():
    params, client, pp, query, corr_item, db = _setup()
    target = corr_item[0, 0]  # instance 0, trial 0 plaintext poly (mod p)

    # correct target: both planes run the hook and still match byte-for-byte
    debug_hooks.set_client_test(client.sk_reg, target)
    want = server_host.process_query(params, pp, query, db)

    srv = SpiralServerJax(params)
    srv.set_db_host_tensor(db)
    got = srv.process_query(pp, query)
    assert got == want

    # wrong target: the hook localizes the failure before pack/encode
    bad = (target + 1) % np.uint64(params.pt_modulus)
    debug_hooks.set_client_test(client.sk_reg, bad)
    with pytest.raises(debug_hooks.ClientTestFailure) as ei:
        server_host.process_query(params, pp, query, db)
    assert np.isfinite(ei.value.noise_width_log2)
    with pytest.raises(debug_hooks.ClientTestFailure):
        srv.process_query(pp, query)


def test_dec_to_raw_measures_noise():
    params = get_fast_expansion_testing_params()
    rng = np.random.default_rng(9)
    p = params.pt_modulus
    scale_k = params.modulus // p
    target = rng.integers(0, p, (1, 1, params.poly_len), dtype=np.uint64)
    centered = np.where(target >= p // 2,
                        target.astype(np.int64) - p, target.astype(np.int64))
    noise = rng.integers(-int(scale_k // 4), int(scale_k // 4),
                         target.shape, dtype=np.int64)
    dec = (centered * scale_k + noise) % params.modulus
    rounded, width = debug_hooks.dec_to_raw(params, dec.astype(np.uint64), target)
    np.testing.assert_array_equal(rounded, target)
    assert width < 2 * np.log2(float(scale_k))

"""Full-protocol tests across the Spiral parameter space: version 1 packing
(2-key w/w_shift), multiple instances, n=4 — mirroring the reference's
4-param-set coverage (client.rs:813-956, e2e params v0/v1)."""

import numpy as np
import pytest

from sdk_tpu import poly, server_host
from sdk_tpu.arith import log2_ceil
from sdk_tpu.client import Client, PublicParameters, Query
from sdk_tpu.ops.server_jax import SpiralServerJax
from sdk_tpu.params import params_from_json
from sdk_tpu.rng import ChaCha20Rng

# small dims so each runs in seconds; crypto shapes from the reference's
# production configs
V1_SMALL = ('{"n": 2, "nu_1": 5, "nu_2": 2, "p": 256, "q2_bits": 22,'
            ' "t_gsw": 7, "t_conv": 3, "t_exp_left": 5, "t_exp_right": 5,'
            ' "instances": 2, "db_item_size": 16384, "version": 1}')
N4_SMALL = ('{"n": 4, "nu_1": 4, "nu_2": 2, "p": 256, "q2_bits": 20,'
            ' "t_gsw": 8, "t_conv": 4, "t_exp_left": 8, "t_exp_right": 56,'
            ' "instances": 1, "db_item_size": 16384}')
INST_SMALL = ('{"n": 2, "nu_1": 5, "nu_2": 2, "p": 256, "q2_bits": 20,'
              ' "t_gsw": 8, "t_conv": 4, "t_exp_left": 8, "t_exp_right": 8,'
              ' "instances": 3, "db_item_size": 12288}')


def run_protocol(cfg: str, target_idx: int, device: bool):
    params = params_from_json(cfg)
    target_idx %= params.num_items()
    client = Client(params)
    pp = client.generate_keys_from_seed(
        b"\x21" * 32, noise_rng=ChaCha20Rng(b"\x22" * 32), pp_seed=b"\x23" * 32)
    pp2 = PublicParameters.deserialize(params, pp.serialize(params))
    query = client.generate_query(
        target_idx, noise_rng=ChaCha20Rng(b"\x24" * 32), query_seed=b"\x25" * 32)
    query2 = Query.deserialize(params, query.serialize(params))
    item, db = server_host.generate_random_db_and_get_item(params, target_idx)
    if device:
        srv = SpiralServerJax(params)
        srv.set_db_host_tensor(db)
        response = srv.process_query(pp2, query2)
    else:
        response = server_host.process_query(params, pp2, query2, db)
    got = client.decode_response(response)
    p_bits = log2_ceil(params.pt_modulus)
    want = poly.raw_to_bytes(params, item, p_bits, params.modp_words_per_chunk())
    assert got == want


@pytest.mark.parametrize("cfg", [V1_SMALL, N4_SMALL, INST_SMALL],
                         ids=["v1-pack", "n4", "instances3"])
def test_full_protocol_host(cfg):
    run_protocol(cfg, 23, device=False)


@pytest.mark.parametrize("cfg", [V1_SMALL, N4_SMALL, INST_SMALL],
                         ids=["v1-pack", "n4", "instances3"])
def test_full_protocol_device(cfg):
    run_protocol(cfg, 23, device=True)

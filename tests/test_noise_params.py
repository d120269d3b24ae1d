"""Noise estimator + params store (reference noise_estimate.rs:138-171)."""

import pytest

from sdk_tpu.noise_estimate import estimate_log2_err_prob, estimate_noise
from sdk_tpu.params import params_from_json
from sdk_tpu.params_store import get_params_from_store


def test_production_config_passes_noise_gate():
    params = params_from_json(
        '{"n": 2, "nu_1": 9, "nu_2": 5, "p": 256, "q2_bits": 22, "t_gsw": 7,'
        ' "t_conv": 3, "t_exp_left": 5, "t_exp_right": 5, "instances": 4,'
        ' "db_item_size": 32768}')
    assert estimate_log2_err_prob(params) <= -40.0


def test_v0_config_passes_noise_gate():
    params = params_from_json(
        '{"n": 4, "nu_1": 9, "nu_2": 5, "p": 256, "q2_bits": 20, "t_gsw": 8,'
        ' "t_conv": 4, "t_exp_left": 8, "t_exp_right": 56, "instances": 1,'
        ' "db_item_size": 32768}')
    assert estimate_log2_err_prob(params) <= -40.0


def test_params_store_lookup():
    params = get_params_from_store(14, 32768)
    assert params.num_items() == 1 << 14
    assert params.item_size() >= 32768
    assert estimate_log2_err_prob(params) <= -40.0

    small = get_params_from_store(10, 256)
    assert small.num_items() == 1 << 10
    assert small.item_size() >= 256

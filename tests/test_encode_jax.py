"""On-device response encode (ops/encode_jax.py) vs the host oracle.

The device rescale must be bit-exact vs arith.rescale (reference
arith.rs:429-444) and the packed words byte-identical to
server_jax.encode_response (reference server.rs:470-503).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdk_tpu.arith import rescale
from sdk_tpu.params import Params, Q2_VALUES, params_from_json
from sdk_tpu.ops.encode_jax import ResponseEncodePlan, rescale_pair
from sdk_tpu.ops.server_jax import _split_pair_np, encode_response


def _params(q2_bits=20, n=2, instances=1, p=256):
    return params_from_json(
        '{"direct_upload": 1, "n": %d, "nu_1": 3, "nu_2": 2, "p": %d,'
        ' "q2_bits": %d, "t_gsw": 4, "t_conv": 4, "t_exp_left": 8,'
        ' "t_exp_right": 8, "instances": %d}' % (n, p, q2_bits, instances))


@pytest.mark.parametrize("q2_bits", [20, 25, 28])
def test_rescale_pair_exact(q2_bits):
    params = _params(q2_bits=q2_bits)
    q = params.modulus
    rng = np.random.default_rng(q2_bits)
    xs = rng.integers(0, q, size=4096, dtype=np.uint64)
    # adversarial boundary values
    edge = np.array([0, 1, q // 2 - 1, q // 2, q // 2 + 1, q - 1],
                    dtype=np.uint64)
    xs = np.concatenate([xs, edge])
    for out_mod in (Q2_VALUES[params.q2_bits], 4 * params.pt_modulus):
        hi, lo = _split_pair_np(xs)
        got = np.asarray(jax.jit(
            lambda h, l: rescale_pair(params, h, l, out_mod))(
                jnp.asarray(hi), jnp.asarray(lo)))
        want = np.array([rescale(int(x), q, out_mod) for x in xs],
                        dtype=np.uint32)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("q2_bits,n,instances", [(20, 2, 1), (28, 2, 4),
                                                 (21, 4, 2)])
def test_encode_plan_byte_identical(q2_bits, n, instances):
    params = _params(q2_bits=q2_bits, n=n, instances=instances)
    plan = ResponseEncodePlan(params)
    rng = np.random.default_rng(7)
    packed = rng.integers(0, params.modulus,
                          (instances, n + 1, n, params.poly_len),
                          dtype=np.uint64)
    want = encode_response(params, packed)
    hi, lo = _split_pair_np(packed)
    words = jax.jit(plan.encode)(jnp.asarray(hi), jnp.asarray(lo))
    got = plan.to_bytes(words)
    assert got == want
    assert len(got) == plan.num_bytes

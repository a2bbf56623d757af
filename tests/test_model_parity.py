"""Golden end-to-end parity: JAX CapsNet + converter vs the torch oracle.

Same reference-format weights, same input -> seg logits and class scores
must agree.  This validates the whole chain the evaluation protocol
depends on (BASELINE: f-mAP/v-mAP must match numerically on identical
checkpoints).  Runs at 96x96 (capsule grid 4x4) to keep compile time in
check; every layer/kernel is identical to the 224 configuration.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from picad_tpu.checkpoint.torch_convert import (
    convert_capsnet_state_dict,
    merge_into_variables,
)
from picad_tpu.models.capsules import CapsNet
from tests.sd_fixtures import fake_capsnet_state_dict


@pytest.mark.heavy
def test_full_model_parity_on_converted_weights(require_accelerator):
    sd = fake_capsnet_state_dict(scale=0.05)
    params, stats, n = convert_capsnet_state_dict(sd)
    # 45 Unit3Ds x 5 tensors + primary caps 4 + conv caps 3 + decoder 16
    assert n == 45 * 5 + 4 + 3 + 16

    H = 96
    rng = np.random.default_rng(11)
    img = rng.uniform(0, 1, (2, 8, H, H, 3)).astype(np.float32)

    # torch oracle (channels-first input)
    from tests.torch_oracle import capsnet_forward

    seg_ref, scores_ref = capsnet_forward(
        np.ascontiguousarray(np.transpose(img, (0, 4, 1, 2, 3))), sd
    )

    m = CapsNet(num_classes=24)
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda: m.init(
            {"params": key, "dropout": key},
            jnp.zeros((1, 8, H, H, 3), jnp.float32),
            jnp.zeros((1,), jnp.int32),
            jnp.ones((1,), jnp.float32),
            0,
            0,
            False,
        )
    )
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    variables = merge_into_variables(variables, params, stats)

    seg, scores, _ = m.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(img),
        jnp.full((2,), 500, jnp.int32),
        jnp.zeros((2,), jnp.float32),
        0,
        0,
        False,
    )
    seg = np.asarray(seg)
    scores = np.asarray(scores)

    np.testing.assert_allclose(scores, scores_ref, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(
        seg, seg_ref.reshape(seg.shape), rtol=5e-2, atol=5e-3
    )

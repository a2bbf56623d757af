"""Model-level parity: CapsNet(fused_head=True) == CapsNet(fused_head=False)
in eval mode (dropout off isolates the affine chain)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from picad_tpu.models.capsules import CapsNet


@pytest.mark.heavy
def test_capsnet_fused_head_matches_unfused(require_accelerator):
    H = 80
    img = jnp.asarray(
        np.random.default_rng(0).random((2, 8, H, H, 3)), jnp.float32
    )
    action = jnp.zeros((2,), jnp.int32)
    flags = jnp.ones((2,), jnp.float32)
    rng = jax.random.PRNGKey(1)

    fused = CapsNet(num_classes=24, fused_head=True)
    variables = fused.init({"params": rng, "dropout": rng},
                           img, action, flags, 0, 0, False)
    unfused = CapsNet(num_classes=24, fused_head=False)

    def fwd(model):
        seg, scores, _ = model.apply(
            variables, img, action, flags, 0, 0, False
        )
        return np.asarray(seg), np.asarray(scores)

    seg_f, sc_f = fwd(fused)
    seg_u, sc_u = fwd(unfused)
    np.testing.assert_allclose(sc_f, sc_u, atol=1e-5)
    np.testing.assert_allclose(seg_f, seg_u, atol=2e-3)  # f32 conv reassoc

"""Value/gradient parity of the width-packed decoder conv (ops/wpack.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from picad_tpu.ops.convops import conv_nd
from picad_tpu.ops.wpack import conv3d_same_wpacked


@pytest.mark.parametrize("ci,co", [(64, 64), (192, 64), (8, 8)])
def test_wpack_values_match_direct(ci, co):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 6, 8, ci)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)) * 0.1, jnp.float32)
    got = conv3d_same_wpacked(x, k)
    want = conv_nd(x, k, 1, "SAME")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5
    )


def test_wpack_gradients_match_direct():
    ci = co = 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 3, 4, 6, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)) * 0.1, jnp.float32)

    gx, gk = jax.grad(
        lambda x, k: jnp.sum(conv3d_same_wpacked(x, k) ** 2), argnums=(0, 1)
    )(x, k)
    gx_r, gk_r = jax.grad(
        lambda x, k: jnp.sum(conv_nd(x, k, 1, "SAME") ** 2), argnums=(0, 1)
    )(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=1e-4)
    # gk flows back through the pack_kernel scatter: each logical tap is
    # the sum of its 6 placed blocks' cotangents
    np.testing.assert_allclose(
        np.asarray(gk), np.asarray(gk_r), atol=1e-4, rtol=1e-4
    )


def test_wpack_bf16():
    ci = co = 16
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 3, 4, 6, ci)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)) * 0.1, jnp.bfloat16)
    got = conv3d_same_wpacked(x, k)
    want = conv_nd(
        x.astype(jnp.float32), k.astype(jnp.float32), 1, "SAME"
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.05
    )

"""Pallas seg-head kernel vs conv_transpose_nd (fwd + custom VJP).

Runs in interpret mode so it validates on any backend; the TPU-compiled
path is exercised by the golden parity test (the model uses the kernel on
TPU) and the train-step measurements.
"""

import numpy as np

import jax
import jax.numpy as jnp

from picad_tpu.ops.convops import conv_transpose_nd
from picad_tpu.ops.pallas_smooth import smooth_head


def _data(B=2, T=4, H=32, W=32, C=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, C, 1)).astype(np.float32) * 0.1)
    return x, k


def test_forward_matches_conv_transpose():
    x, k = _data()
    ref = conv_transpose_nd(x, k, 1, 1, 0)[..., 0]
    out = smooth_head(x, k, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_forward_t_boundaries():
    # small T exercises the t-halo masking on both ends
    x, k = _data(B=1, T=2, H=32, W=16, C=8, seed=1)
    ref = conv_transpose_nd(x, k, 1, 1, 0)[..., 0]
    out = smooth_head(x, k, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_autodiff_of_reference():
    x, k = _data(B=1, T=3, H=32, W=16, C=8, seed=2)

    def f_pallas(x, k):
        return jnp.sum(jnp.sin(smooth_head(x, k, True)))

    def f_ref(x, k):
        return jnp.sum(jnp.sin(conv_transpose_nd(x, k, 1, 1, 0)[..., 0]))

    gp = jax.grad(f_pallas, argnums=(0, 1))(x, k)
    gr = jax.grad(f_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]), rtol=1e-4, atol=2e-4)

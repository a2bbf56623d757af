"""Exactness of the fused decoder head vs the unfused ConvT chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from picad_tpu.ops.convops import conv_transpose_nd
from picad_tpu.ops.fused_head import fused_decoder_head, smooth_bias_map

RNG = np.random.default_rng(7)


def unfused(x, k1, b4, k2, bs, drop_scale):
    y = conv_transpose_nd(x, k1, 2, 1, 1) + b4
    y = y * drop_scale[:, None, None, None, :]
    seg = conv_transpose_nd(y, k2, 1, 1, 0)[..., 0] + bs.reshape(())
    return seg


def rand_setup(B=2, T=3, H=6, W=5, C=7, M=4):
    x = jnp.asarray(RNG.standard_normal((B, T, H, W, C)), jnp.float32)
    k1 = jnp.asarray(RNG.standard_normal((3, 3, 3, C, M)) * 0.1, jnp.float32)
    b4 = jnp.asarray(RNG.standard_normal((M,)), jnp.float32)
    k2 = jnp.asarray(RNG.standard_normal((3, 3, 3, M, 1)) * 0.1, jnp.float32)
    bs = jnp.asarray(RNG.standard_normal((1,)), jnp.float32)
    drop = jnp.asarray(
        (RNG.random((B, M)) > 0.5).astype(np.float32) * 2.0, jnp.float32
    )
    return x, k1, b4, k2, bs, drop


def test_composition_with_corrections_matches_two_convts():
    """The corrected composite == the literal ConvT pair (no dropout,
    no biases): isolates the kernel composition + cropped-plane I-E."""
    x, k1, b4, k2, bs, drop = rand_setup()
    B, M = x.shape[0], k1.shape[-1]
    two = conv_transpose_nd(
        conv_transpose_nd(x, k1, 2, 1, 1), k2, 1, 1, 0
    )[..., 0]
    one = fused_decoder_head(
        x, k1, jnp.zeros((M,)), k2, jnp.zeros((1,)),
        jnp.ones((B, M)),
    )
    np.testing.assert_allclose(np.asarray(one), np.asarray(two), atol=1e-4)


def test_smooth_bias_map_matches_convt_of_ones():
    _, _, _, k2, _, _ = rand_setup()
    T2, H2, W2 = 6, 12, 10
    M = k2.shape[3]
    ones = jnp.ones((1, T2, H2, W2, M), jnp.float32)
    # per-channel: convT of the m-th indicator
    S = smooth_bias_map(k2, (T2, H2, W2))
    for m in range(M):
        e = jnp.zeros((1, T2, H2, W2, M)).at[..., m].set(1.0)
        ref = conv_transpose_nd(e, k2, 1, 1, 0)[0, ..., 0]
        np.testing.assert_allclose(
            np.asarray(S[..., m]), np.asarray(ref), atol=1e-5
        )


@pytest.mark.parametrize("shape", [(2, 3, 6, 5, 7, 4), (1, 4, 8, 8, 5, 6)])
def test_fused_head_exact(shape):
    B, T, H, W, C, M = shape
    x, k1, b4, k2, bs, drop = rand_setup(B, T, H, W, C, M)
    ref = unfused(x, k1, b4, k2, bs, drop)
    out = fused_decoder_head(x, k1, b4, k2, bs, drop)
    assert out.shape == (B, 2 * T, 2 * H, 2 * W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_head_gradients_match():
    x, k1, b4, k2, bs, drop = rand_setup()

    def loss_ref(params):
        return jnp.sum(unfused(x, *params, drop) ** 2)

    def loss_fused(params):
        return jnp.sum(fused_decoder_head(x, *params, drop) ** 2)

    g_ref = jax.grad(loss_ref)((k1, b4, k2, bs))
    g_fus = jax.grad(loss_fused)((k1, b4, k2, bs))
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)

"""Pallas composite-ConvT kernel vs the XLA ConvT chain: values + grads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from picad_tpu.ops.convops import conv_transpose_nd

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernel"
)

RNG = np.random.default_rng(3)


def setup(B=2, T=3, H=32, W=24, C=128, M=8):
    # C matches the production channel count; the kernel's VMEM scratch
    # slicing needs a full lane dim (C < 128 fails Mosaic's memref_slice)
    x = jnp.asarray(RNG.standard_normal((B, T, H, W, C)), jnp.float32)
    k1 = jnp.asarray(RNG.standard_normal((3, 3, 3, C, M)) * 0.2, jnp.float32)
    k2 = jnp.asarray(RNG.standard_normal((3, 3, 3, M, 1)) * 0.2, jnp.float32)
    drop = jnp.asarray(
        (RNG.random((B, M)) > 0.4).astype(np.float32) * 2.0, jnp.float32
    )
    return x, k1, k2, drop


@pytest.mark.parametrize("W", [24, 48])
def test_composite_convt_matches_chain(W):
    from picad_tpu.ops.fused_head import compose_transpose_kernels
    from picad_tpu.ops.pallas_fused_head import composite_convt

    x, k1, k2, drop = setup(W=W)
    P = compose_transpose_kernels(k1, k2)
    Kc = jnp.einsum("tuvcm,bm->btuvc", P, drop)
    out = composite_convt(x, Kc)

    # XLA reference of the same raw composite (leak included): one
    # ConvT(k5, s2, p2, op1) per sample
    ref = jax.vmap(
        lambda xb, kb: conv_transpose_nd(
            xb[None], kb[..., None], 2, 2, 1
        )[0, ..., 0]
    )(x, Kc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)


def test_fused_decoder_head_pallas_path_exact():
    """Full fused_decoder_head (Pallas raw + XLA corrections + bias map)
    vs the literal chain, including borders."""
    from picad_tpu.ops.fused_head import fused_decoder_head

    x, k1, k2, drop = setup()
    M = k1.shape[-1]
    b4 = jnp.asarray(RNG.standard_normal((M,)), jnp.float32)
    bs = jnp.asarray(RNG.standard_normal((1,)), jnp.float32)

    y = conv_transpose_nd(x, k1, 2, 1, 1) + b4
    y = y * drop[:, None, None, None, :]
    ref = conv_transpose_nd(y, k2, 1, 1, 0)[..., 0] + bs.reshape(())

    out = fused_decoder_head(x, k1, b4, k2, bs, drop)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_composite_convt_gradients():
    from picad_tpu.ops.fused_head import compose_transpose_kernels
    from picad_tpu.ops.pallas_fused_head import composite_convt

    x, k1, k2, drop = setup()
    P = compose_transpose_kernels(k1, k2)
    Kc = jnp.einsum("tuvcm,bm->btuvc", P, drop)

    def loss_pallas(xx, kk):
        return jnp.sum(composite_convt(xx, kk) ** 2)

    def loss_ref(xx, kk):
        # XLA reference of the same raw composite (leak included): one
        # ConvT(k5, s2, p2, op1) per sample, vmapped.  kk[b] is
        # (5,5,5,C) -> conv kernel (5,5,5,C,1).
        out = jax.vmap(
            lambda xb, kb: conv_transpose_nd(
                xb[None], kb[..., None], 2, 2, 1
            )[0, ..., 0]
        )(xx, kk)
        return jnp.sum(out ** 2)

    gx_p, gk_p = jax.grad(loss_pallas, argnums=(0, 1))(x, Kc)
    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, Kc)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=3e-3)
    # dKc values are O(1e3) sums over all positions: compare relatively
    np.testing.assert_allclose(
        np.asarray(gk_p), np.asarray(gk_r), rtol=2e-3, atol=5e-3
    )


def test_composite_convt_gradients_bench_width():
    """Same gradient parity at the W=112 bench width (the Pallas
    backward's rolls/masks cover the clamped top and bottom chunks)."""
    from picad_tpu.ops.fused_head import compose_transpose_kernels
    from picad_tpu.ops.pallas_fused_head import composite_convt

    rng = np.random.default_rng(5)
    B, T, H, W, C, M = 1, 2, 48, 112, 128, 4
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, C, M)) * 0.2, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 3, M, 1)) * 0.2, jnp.float32)
    P = compose_transpose_kernels(k1, k2)
    Kc = jnp.einsum("tuvcm,bm->btuvc", P, jnp.ones((B, M), jnp.float32))

    def loss_pallas(xx, kk):
        return jnp.sum(composite_convt(xx, kk) ** 2)

    def loss_ref(xx, kk):
        out = jax.vmap(
            lambda xb, kb: conv_transpose_nd(
                xb[None], kb[..., None], 2, 2, 1
            )[0, ..., 0]
        )(xx, kk)
        return jnp.sum(out ** 2)

    gx_p, gk_p = jax.grad(loss_pallas, argnums=(0, 1))(x, Kc)
    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, Kc)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(gk_p), np.asarray(gk_r), rtol=2e-3, atol=5e-3
    )


def test_composite_convt_bf16_values_and_grads():
    """The PRODUCTION dtype: bf16 x/Kc through the Pallas forward AND
    backward (the bwd kernel crosses gp in f32 precisely because bf16
    sublane packing breaks the dummy-dim DMA slice — this test is the
    regression guard).  Compared against the f32 XLA chain at bf16
    tolerances.

    Runs under DEFAULT matmul precision like production: the conftest's
    global `highest` makes XLA ask Mosaic for a multi-pass bf16 matmul
    emulation it rejects ("Bad lhs type") — bf16 model code never runs
    under `highest`."""
    from picad_tpu.ops.fused_head import compose_transpose_kernels
    from picad_tpu.ops.pallas_fused_head import composite_convt

    rng = np.random.default_rng(7)
    B, T, H, W, C, M = 2, 2, 32, 112, 128, 4
    x32 = jnp.asarray(rng.standard_normal((B, T, H, W, C)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, C, M)) * 0.2, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 3, M, 1)) * 0.2, jnp.float32)
    P = compose_transpose_kernels(k1, k2)
    Kc32 = jnp.einsum("tuvcm,bm->btuvc", P, jnp.ones((B, M), jnp.float32))
    x, Kc = x32.astype(jnp.bfloat16), Kc32.astype(jnp.bfloat16)

    def loss_pallas(xx, kk):
        return jnp.sum(composite_convt(xx, kk).astype(jnp.float32) ** 2)

    def loss_ref(xx, kk):
        out = jax.vmap(
            lambda xb, kb: conv_transpose_nd(
                xb[None], kb[..., None], 2, 2, 1
            )[0, ..., 0]
        )(xx, kk)
        return jnp.sum(out ** 2)

    with jax.default_matmul_precision("default"):
        out_p = composite_convt(x, Kc)
        (gx_p, gk_p) = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))(x, Kc)
    out_r = jax.vmap(
        lambda xb, kb: conv_transpose_nd(xb[None], kb[..., None], 2, 2, 1)[
            0, ..., 0
        ]
    )(x32, Kc32)
    (gx_r, gk_r) = jax.grad(loss_ref, argnums=(0, 1))(x32, Kc32)

    # bf16 inputs: ~3 significant decimal digits; values are O(sqrt(C))
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_r), atol=0.35
    )
    np.testing.assert_allclose(
        np.asarray(gx_p, np.float32), np.asarray(gx_r), atol=12.0, rtol=0.1
    )
    np.testing.assert_allclose(
        np.asarray(gk_p, np.float32), np.asarray(gk_r), rtol=0.1, atol=40.0
    )

"""Oracle tests for the tap-GEMM VALID-conv kernels (ops/tapconv.py).

Interpret mode exercises the full Pallas path — including the 16-bit
pair packing / bitcast addressing — on CPU; the TPU test runs the
production PrimaryCaps shape on hardware when available.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from picad_tpu.ops.convops import conv_nd
from picad_tpu.ops.tapconv import tap_conv_valid


def _mk(B, H, W, Ci, Co, KH, KW, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, H, W, Ci)) * 0.2, dtype)
    w = jnp.asarray(rng.standard_normal((KH, KW, Ci, Co)) * 0.1, dtype)
    return x, w


@pytest.mark.parametrize(
    "shape",
    [
        (2, 10, 9, 8, 16, 3, 3),    # odd W: taps of both parities
        (2, 18, 16, 8, 8, 5, 5),    # multiple M chunks after padding
        (1, 12, 12, 16, 8, 9, 9),   # the PrimaryCaps kernel size
    ],
)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_values_match_lax_conv(shape, dtype):
    B, H, W, Ci, Co, KH, KW = shape
    x, w = _mk(B, H, W, Ci, Co, KH, KW, dtype)
    got = tap_conv_valid(x, w, True)
    want = conv_nd(x.astype(jnp.float32), w.astype(jnp.float32), 1, "VALID")
    atol = 1e-5 if dtype == jnp.float32 else 0.05
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=atol
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gradients_match_lax_conv(dtype):
    B, H, W, Ci, Co, KH, KW = 2, 10, 9, 8, 16, 3, 3
    x, w = _mk(B, H, W, Ci, Co, KH, KW, dtype, seed=3)

    def loss_pallas(x, w):
        return jnp.sum(tap_conv_valid(x, w, True).astype(jnp.float32) ** 2)

    def loss_ref(x, w):
        return jnp.sum(conv_nd(x, w, 1, "VALID").astype(jnp.float32) ** 2)

    gx, gw = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    x32, w32 = x.astype(jnp.float32), w.astype(jnp.float32)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x32, w32)
    if dtype == jnp.float32:
        atol_x, atol_w = 1e-4, 1e-3
    else:
        atol_x, atol_w = 0.3, 1.0  # bf16 inputs: ~3 significant digits
    np.testing.assert_allclose(
        np.asarray(gx, np.float32), np.asarray(gx_r), atol=atol_x
    )
    np.testing.assert_allclose(
        np.asarray(gw, np.float32), np.asarray(gw_r), atol=atol_w,
        rtol=0.05,
    )


def test_fallback_gradients_match():
    """The non-Pallas custom-VJP branch (CPU dispatch) is its own code
    path; check it against jax's autodiff of the plain conv."""
    B, H, W, Ci, Co, KH, KW = 2, 12, 12, 8, 8, 9, 9
    x, w = _mk(B, H, W, Ci, Co, KH, KW, jnp.float32, seed=5)

    def loss_tap(x, w):
        return jnp.sum(tap_conv_valid(x, w) ** 2)

    def loss_ref(x, w):
        return jnp.sum(conv_nd(x, w, 1, "VALID") ** 2)

    gx, gw = jax.grad(loss_tap, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gw), np.asarray(gw_r), atol=1e-3, rtol=1e-4
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="TPU hardware kernel test"
)
def test_tpu_primary_caps_shape_bf16():
    """Production shape (B=16 fold-flip batch at 224^2): values and both
    gradients on hardware at bf16, default matmul precision (production;
    the conftest's global `highest` would make XLA ask Mosaic for a
    multi-pass bf16 emulation it rejects)."""
    B, H, W, Ci, Co, KH, KW = 4, 28, 28, 832, 544, 9, 9
    x, w = _mk(B, H, W, Ci, Co, KH, KW, jnp.bfloat16, seed=7)

    def loss_pallas(x, w):
        return jnp.sum(tap_conv_valid(x, w).astype(jnp.float32) ** 2)

    def loss_ref(x, w):
        return jnp.sum(
            conv_nd(x, w, 1, "VALID").astype(jnp.float32) ** 2
        )

    with jax.default_matmul_precision("default"):
        out = jax.jit(lambda x, w: tap_conv_valid(x, w))(x, w)
        gx, gw = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))(x, w)
        want = conv_nd(
            x.astype(jnp.float32), w.astype(jnp.float32), 1, "VALID"
        )
        gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(
            x.astype(jnp.float32), w.astype(jnp.float32)
        )
    # values are O(sqrt(Ci)*0.02); bf16 rounding of x/w dominates
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want), atol=0.35
    )
    np.testing.assert_allclose(
        np.asarray(gx, np.float32), np.asarray(gx_r), atol=25.0, rtol=0.1
    )
    np.testing.assert_allclose(
        np.asarray(gw, np.float32), np.asarray(gw_r), atol=60.0, rtol=0.1
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_3d_values_and_gradients(dtype):
    """The flat-canvas identity is rank-agnostic: 3-D VALID conv (the
    decoder convs' shape family) through the same kernels."""
    B, T, H, W, Ci, Co = 1, 4, 8, 9, 8, 8
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((B, T, H, W, Ci)) * 0.2, dtype)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, Ci, Co)) * 0.1, dtype)

    got = tap_conv_valid(x, w, True)
    want = conv_nd(x.astype(jnp.float32), w.astype(jnp.float32), 1, "VALID")
    atol = 1e-5 if dtype == jnp.float32 else 0.05
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=atol
    )

    def loss_pallas(x, w):
        return jnp.sum(tap_conv_valid(x, w, True).astype(jnp.float32) ** 2)

    def loss_ref(x, w):
        return jnp.sum(conv_nd(x, w, 1, "VALID").astype(jnp.float32) ** 2)

    gx, gw = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(
        x.astype(jnp.float32), w.astype(jnp.float32)
    )
    atol_x, atol_w = (1e-4, 1e-3) if dtype == jnp.float32 else (0.3, 1.0)
    np.testing.assert_allclose(
        np.asarray(gx, np.float32), np.asarray(gx_r), atol=atol_x
    )
    np.testing.assert_allclose(
        np.asarray(gw, np.float32), np.asarray(gw_r), atol=atol_w, rtol=0.05
    )


def test_same_padding_composes():
    """SAME conv = pad + tap_conv_valid; gradients crop automatically
    through jnp.pad's VJP (how the decoder 3x3x3 convs would use it)."""
    B, T, H, W, C = 1, 3, 6, 6, 8
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.1, jnp.float32)

    def same_tap(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        return tap_conv_valid(xp, w, True)

    got = same_tap(x, w)
    want = conv_nd(x, w, 1, "SAME")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    gx, = jax.grad(lambda x: jnp.sum(same_tap(x, w) ** 2), argnums=(0,))(x)
    gx_r, = jax.grad(lambda x: jnp.sum(conv_nd(x, w, 1, "SAME") ** 2),
                     argnums=(0,))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dw_dense_variant_matches(dtype, monkeypatch):
    """The PICAD_TAPCONV_DW=dense weight-grad kernel (dynamic tiled-dim
    slices) computes the same dW as the default degenerate-layout one."""
    import picad_tpu.ops.tapconv as tc
    from picad_tpu.ops.tapconv import _dw_impl

    B, H, W, Ci, Co, KH, KW = 2, 10, 9, 8, 16, 3, 3
    x, w = _mk(B, H, W, Ci, Co, KH, KW, dtype, seed=9)
    rng = np.random.default_rng(10)
    g = jnp.asarray(
        rng.standard_normal((B, H - KH + 1, W - KW + 1, Co)) * 0.3, dtype
    )
    dw_v1 = _dw_impl(x, g, w.shape, interpret=True)
    monkeypatch.setattr(tc, "_DW_VARIANT", "dense")
    dw_dense = _dw_impl(x, g, w.shape, interpret=True)
    np.testing.assert_allclose(
        np.asarray(dw_v1), np.asarray(dw_dense), atol=1e-5
    )

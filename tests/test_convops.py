"""conv/pool/conv-transpose semantics vs torch-CPU oracles (small shapes)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from picad_tpu.ops.convops import (
    conv_nd,
    conv_transpose_nd,
    max_pool_same_zero_pad,
    same_pads,
)

RNG = np.random.default_rng(0)


def _torch_same_pad_conv3d(x, w, stride):
    """TF-SAME dynamic padding + VALID conv3d, the reference Unit3D rule."""
    _, _, t, h, w_ = x.shape
    k = w.shape[2:]
    pads = []
    for dim, s_ in zip((t, h, w_), stride):
        pass
    pad_pairs = [same_pads(s, k[i], stride[i]) for i, s in enumerate((t, h, w_))]
    # F.pad takes (w_lo, w_hi, h_lo, h_hi, t_lo, t_hi)
    flat = []
    for lo, hi in reversed(pad_pairs):
        flat += [lo, hi]
    x = F.pad(x, flat)
    return F.conv3d(x, w, stride=stride)


@pytest.mark.parametrize(
    "shape,kernel,stride",
    [
        ((2, 3, 8, 12, 12), (7, 7, 7), (2, 2, 2)),
        ((2, 4, 8, 9, 9), (3, 3, 3), (2, 1, 1)),
        ((1, 2, 5, 10, 10), (1, 3, 3), (1, 2, 2)),
        ((1, 2, 4, 8, 8), (1, 1, 1), (1, 1, 1)),
    ],
)
def test_conv3d_same_matches_torch(shape, kernel, stride):
    cin, cout = shape[1], 5
    x = RNG.standard_normal(shape).astype(np.float32)
    w = RNG.standard_normal((cout, cin, *kernel)).astype(np.float32) * 0.1

    ref = _torch_same_pad_conv3d(torch.from_numpy(x), torch.from_numpy(w), stride)
    ref = ref.numpy()

    # channels-last input, (D,H,W,I,O) kernel
    xj = jnp.asarray(np.moveaxis(x, 1, -1))
    wj = jnp.asarray(np.moveaxis(w, (0, 1), (-1, -2)))
    out = conv_nd(xj, wj, stride, "SAME")
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "stride,padding,output_padding",
    [(1, 0, 0), (2, 1, 1), (2, 0, 1), (1, 1, 0), (3, 2, 2)],
)
def test_conv_transpose3d_matches_torch(stride, padding, output_padding):
    cin, cout = 4, 3
    k = 3
    x = RNG.standard_normal((2, cin, 3, 5, 5)).astype(np.float32)
    w = RNG.standard_normal((cin, cout, k, k, k)).astype(np.float32) * 0.1

    ref = F.conv_transpose3d(
        torch.from_numpy(x),
        torch.from_numpy(w),
        stride=stride,
        padding=padding,
        output_padding=output_padding,
    ).numpy()

    xj = jnp.asarray(np.moveaxis(x, 1, -1))
    # torch CT weight (Cin, Cout, *k) -> our conv orientation (*k, Cin, Cout)
    wj = jnp.asarray(np.moveaxis(w, (0, 1), (-2, -1)))
    out = conv_transpose_nd(xj, wj, stride, padding, output_padding)
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_conv_transpose2d_full_k9():
    """The decoder's upsample1: 20x20 -> 28x28 with k9 s1 p0."""
    cin, cout = 6, 4
    x = RNG.standard_normal((1, cin, 20, 20)).astype(np.float32)
    w = RNG.standard_normal((cin, cout, 9, 9)).astype(np.float32) * 0.05
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w)).numpy()
    xj = jnp.asarray(np.moveaxis(x, 1, -1))
    wj = jnp.asarray(np.moveaxis(w, (0, 1), (-2, -1)))
    out = conv_transpose_nd(xj, wj, 1, 0, 0)
    assert out.shape == (1, 28, 28, cout)
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "kernel,stride",
    [((1, 3, 3), (1, 2, 2)), ((3, 3, 3), (2, 1, 1)), ((3, 3, 3), (1, 1, 1)), ((2, 2, 2), (2, 2, 2))],
)
def test_maxpool_same_zero_pad_matches_torch(kernel, stride):
    # Include negative values: zero padding (not -inf) must win at borders.
    x = RNG.standard_normal((2, 3, 5, 9, 9)).astype(np.float32) - 2.0

    t, h, w_ = x.shape[2:]
    pad_pairs = [same_pads(s, kernel[i], stride[i]) for i, s in enumerate((t, h, w_))]
    flat = []
    for lo, hi in reversed(pad_pairs):
        flat += [lo, hi]
    ref = F.max_pool3d(F.pad(torch.from_numpy(x), flat), kernel, stride).numpy()

    xj = jnp.asarray(np.moveaxis(x, 1, -1))
    out = max_pool_same_zero_pad(xj, kernel, stride)
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, rtol=0, atol=0)


def test_max_pool_custom_vjp_matches_select_and_scatter():
    """Tap-loop VJP == XLA select-and-scatter on tie-free inputs (ties
    only matter at ReLU zeros, where the preceding ReLU backward zeroes
    the gradient anyway — see max_pool_same_zero_pad docstring)."""
    import jax
    from jax import lax

    from picad_tpu.ops.convops import max_pool_same_zero_pad, same_pads

    rng = np.random.default_rng(11)
    for shape, k, s in [
        ((2, 4, 9, 9, 6), (3, 3, 3), (1, 1, 1)),
        ((2, 4, 9, 9, 6), (1, 3, 3), (1, 2, 2)),
        ((2, 5, 8, 8, 4), (3, 3, 3), (2, 1, 1)),
        ((1, 4, 7, 7, 3), (2, 2, 2), (2, 2, 2)),
    ]:
        # distinct values => no ties anywhere (incl. vs pad zeros)
        x = rng.permutation(np.arange(1, np.prod(shape) + 1)).reshape(
            shape
        ).astype(np.float32)
        x = jnp.asarray(x)

        def loss_new(v):
            return jnp.sum(max_pool_same_zero_pad(v, k, s) ** 2)

        def ref_pool(v):
            n = v.ndim - 2
            pads = [(0, 0)] + [
                same_pads(v.shape[1 + i], k[i], s[i]) for i in range(n)
            ] + [(0, 0)]
            vp = jnp.pad(v, pads)
            return lax.reduce_window(
                vp, -jnp.inf, lax.max,
                window_dimensions=(1, *k, 1),
                window_strides=(1, *s, 1), padding="VALID",
            )

        def loss_ref(v):
            return jnp.sum(ref_pool(v) ** 2)

        np.testing.assert_allclose(
            np.asarray(max_pool_same_zero_pad(x, k, s)),
            np.asarray(ref_pool(x)),
        )
        g_new = jax.grad(loss_new)(x)
        g_ref = jax.grad(loss_ref)(x)
        np.testing.assert_allclose(
            np.asarray(g_new), np.asarray(g_ref), rtol=1e-6,
            err_msg=f"{k} {s}",
        )

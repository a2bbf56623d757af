"""Convolution / pooling primitives with torch-equivalent semantics.

Channels-last layouts throughout: inputs are (B, *spatial, C), kernels are
(*spatial, Cin, Cout).  XLA lowers these directly onto the MXU without
layout transposes on TPU.

Semantics matched to the reference (cited file:line are in /root/reference):

- TF-style "SAME" dynamic padding as re-implemented by the reference's
  Unit3D.forward / MaxPool3dSamePadding.forward (models/pytorch_i3d.py:21-45,
  89-113): total pad per dim = max(k - s, 0) if s divides the input size,
  else max(k - size % s, 0); split low = pad // 2, high = pad - low.  This is
  exactly XLA's "SAME" convention, but we compute pads explicitly so the
  rule is visible and testable.
- Zero-padded max pooling: the reference pads with F.pad (zeros) before
  `nn.MaxPool3d` (models/pytorch_i3d.py:44-45).  We replicate by explicit
  zero padding + VALID reduce-window, which differs from -inf-padded "SAME"
  pooling whenever inputs can be negative.
- PyTorch ConvTransposeNd with `output_padding`
  (models/capsules_ucf101.py:358-374): out = (in-1)*s - 2p + k + op,
  implemented as an input-dilated convolution with per-edge padding
  (k-1-p, k-1-p+op) and a spatially-flipped kernel.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _tuple(v, n: int):
    if isinstance(v, (tuple, list)):
        assert len(v) == n, (v, n)
        return tuple(int(x) for x in v)
    return (int(v),) * n


def same_pads(size: int, kernel: int, stride: int) -> tuple[int, int]:
    """TF-SAME padding (low, high) for one spatial dim.

    Matches models/pytorch_i3d.py:82-86 (compute_pad) + the low/high split
    at :102-107.
    """
    if size % stride == 0:
        pad = max(kernel - stride, 0)
    else:
        pad = max(kernel - (size % stride), 0)
    lo = pad // 2
    return (lo, pad - lo)


def _dim_numbers(n_spatial: int) -> lax.ConvDimensionNumbers:
    # channels-last: e.g. for 3D, lhs NDHWC, rhs DHWIO, out NDHWC.
    spatial = "".join(chr(ord("0") + i) for i in range(n_spatial))
    lhs = "N" + spatial + "C"
    rhs = spatial + "IO"
    return lax.conv_dimension_numbers(
        (1,) * (n_spatial + 2), (1,) * (n_spatial + 2), (lhs, rhs, lhs)
    )


def conv_nd(
    x: jax.Array,
    kernel: jax.Array,
    stride,
    padding,
    *,
    preferred_dtype=None,
) -> jax.Array:
    """N-d convolution, channels-last.

    preferred_dtype=None inherits the input dtype (bf16 compute stays bf16
    end-to-end, which keeps the VJP dtypes consistent); pass jnp.float32
    explicitly for f32 accumulation into an f32 output.

    x: (B, *spatial, Cin); kernel: (*spatial, Cin, Cout).
    padding: 'SAME' (TF rule above), 'VALID', int, per-dim int, or explicit
    per-dim (lo, hi) pairs.
    """
    n = x.ndim - 2
    stride = _tuple(stride, n)
    kdims = kernel.shape[:n]
    if padding == "SAME":
        pads = [same_pads(x.shape[1 + i], kdims[i], stride[i]) for i in range(n)]
    elif padding == "VALID":
        pads = [(0, 0)] * n
    elif isinstance(padding, int):
        pads = [(padding, padding)] * n
    else:
        pads = [p if isinstance(p, (tuple, list)) else (p, p) for p in padding]
        pads = [tuple(int(v) for v in p) for p in pads]
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=pads,
        dimension_numbers=_dim_numbers(n),
        preferred_element_type=preferred_dtype,
    )


def conv_transpose_nd(
    x: jax.Array,
    kernel: jax.Array,
    stride,
    padding,
    output_padding=0,
    *,
    preferred_dtype=None,
) -> jax.Array:
    """PyTorch-semantics transposed convolution, channels-last.

    x: (B, *spatial, Cin); kernel: (*spatial, Cin, Cout) — already in conv
    orientation (the checkpoint converter flips/transposes torch's
    (Cin, Cout, *k) weights into this layout once at load time, so the hot
    path is a single dilated conv).

    out_size = (in - 1) * stride - 2 * padding + kernel + output_padding,
    matching nn.ConvTransposeNd (models/capsules_ucf101.py:361-374).

    Implemented as lhs-dilated convolution with the kernel spatially
    flipped: equivalent to torch's gradient-of-conv definition.
    """
    n = x.ndim - 2
    stride = _tuple(stride, n)
    padding = _tuple(padding, n)
    output_padding = _tuple(output_padding, n)
    kdims = kernel.shape[:n]
    pads = [
        (kdims[i] - 1 - padding[i], kdims[i] - 1 - padding[i] + output_padding[i])
        for i in range(n)
    ]
    flipped = jnp.flip(kernel, axis=tuple(range(n)))
    return lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1,) * n,
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=_dim_numbers(n),
        preferred_element_type=preferred_dtype,
    )


def _max_pool_fwd_raw(x: jax.Array, kernel, stride) -> jax.Array:
    n = x.ndim - 2
    kernel = _tuple(kernel, n)
    stride = _tuple(stride, n)
    pads = [(0, 0)] + [
        same_pads(x.shape[1 + i], kernel[i], stride[i]) for i in range(n)
    ] + [(0, 0)]
    xp = jnp.pad(x, pads, mode="constant", constant_values=0.0)
    return lax.reduce_window(
        xp,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, *kernel, 1),
        window_strides=(1, *stride, 1),
        padding="VALID",
    )


def max_pool_same_zero_pad(x: jax.Array, kernel, stride) -> jax.Array:
    """Max pool with TF-SAME *zero* padding, channels-last.

    The reference zero-pads then max-pools (models/pytorch_i3d.py:21-45).
    Zero padding (not -inf) is part of its numerics; its pool inputs are
    post-ReLU so the two coincide there, but we keep the exact semantics.

    Backward, measured on TPU at the reference config:
    - stride-1 pools (the Inception-branch 3x3x3 pools): XLA's
      select-and-scatter lowering costs ~8 ms/step; a tap-loop VJP
      (`grad[i] = sum over windows w containing i of
      1[x[i] == max(w)] * g[w]`) is several times faster, so they route
      through `_max_pool_tap_vjp`.  This is "all-max" subgradient
      routing vs first-max; the two differ only on in-window ties,
      which here occur only at ReLU zeros — positions whose gradient
      the preceding ReLU's own backward zeroes anyway (ties between
      equal positive activations have measure zero).
    - strided pools: the tap VJP needs interior-dilated pads of y/g
      which XLA materializes expensively (~8 ms each at 113^2) —
      select-and-scatter wins there, so they keep the default grad.
    """
    n = x.ndim - 2
    stride_t = _tuple(stride, n)
    if all(s == 1 for s in stride_t):
        return _max_pool_tap_vjp(x, _tuple(kernel, n), stride_t)
    return _max_pool_fwd_raw(x, kernel, stride)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool_tap_vjp(x: jax.Array, kernel, stride) -> jax.Array:
    return _max_pool_fwd_raw(x, kernel, stride)


def _max_pool_fwd(x, kernel, stride):
    y = _max_pool_fwd_raw(x, kernel, stride)
    return y, (x, y)


def _max_pool_bwd(kernel, stride, res, g):
    x, y = res
    n = x.ndim - 2
    kernel = _tuple(kernel, n)
    stride = _tuple(stride, n)
    pads = [same_pads(x.shape[1 + i], kernel[i], stride[i]) for i in range(n)]
    # Dilate y/g back onto the padded-input grid (window w lives at
    # w * stride), then for each tap offset compare x against the
    # window max and route the gradient.
    ysh = y.shape
    dil = [(0, 0, 0)] + [(0, 0, stride[i] - 1) for i in range(n)] + [(0, 0, 0)]
    neg = jnp.array(-jnp.inf, y.dtype)
    yd = lax.pad(y, neg, dil)  # -inf between windows: never matches
    gd = lax.pad(g, jnp.array(0.0, g.dtype), dil)
    # pad so that every tap shift is a valid slice on the padded-x grid
    xp_pads = [(0, 0)] + [
        (pads[i][0], pads[i][1]) for i in range(n)
    ] + [(0, 0)]
    xp = jnp.pad(x, xp_pads)
    full = [(0, 0)] + [
        (kernel[i] - 1, kernel[i] - 1) for i in range(n)
    ] + [(0, 0)]
    ydf = jnp.pad(yd, full, constant_values=-jnp.inf)
    gdf = jnp.pad(gd, full, constant_values=0.0)

    import itertools as _it

    grad_xp = jnp.zeros(xp.shape, jnp.float32)
    sp = xp.shape[1 : 1 + n]
    for taps in _it.product(*[range(k) for k in kernel]):
        # window start j - tap on the dilated grid; +(k-1) pad offset
        idx = (slice(None),) + tuple(
            slice(kernel[i] - 1 - taps[i], kernel[i] - 1 - taps[i] + sp[i])
            for i in range(n)
        ) + (slice(None),)
        match = (xp == ydf[idx]).astype(jnp.float32)
        grad_xp = grad_xp + match * gdf[idx].astype(jnp.float32)
    # strip the zero padding
    unpad = (slice(None),) + tuple(
        slice(pads[i][0], pads[i][0] + x.shape[1 + i]) for i in range(n)
    ) + (slice(None),)
    return (grad_xp[unpad].astype(x.dtype),)


_max_pool_tap_vjp.defvjp(_max_pool_fwd, _max_pool_bwd)

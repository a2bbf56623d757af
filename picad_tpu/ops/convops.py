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


def conv_transpose_single_channel(
    x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None
) -> jax.Array:
    """Stride-1, pad-1 ConvTranspose3d with ONE output channel, fast path.

    A direct Cout=1 convolution leaves 127/128 vector lanes idle (XLA lays
    the single channel on the minor dim) — measured 7x slower than
    bandwidth allows.  Reformulation: contract channels first on the MXU,
    z[..., tap] = x . K[c, tap] over all 27 taps at once, then accumulate
    the 27 spatially shifted tap planes.  Identical math to
    conv_transpose_nd(x, kernel, 1, 1, 0) for kernel (3, 3, 3, C, 1); the
    backward (via autodiff of this formulation) is equally lane-friendly.

    x: (B, T, H, W, C); kernel: (3, 3, 3, C, 1).  Returns (B, T, H, W).
    """
    B, T, H, W, C = x.shape
    kt, kh, kw, kc, ko = kernel.shape
    assert (kt, kh, kw, ko) == (3, 3, 3, 1) and kc == C, kernel.shape
    kf = jnp.flip(kernel[..., 0], axis=(0, 1, 2))  # conv orientation
    K = kf.reshape(27, C).T  # (C, 27)
    z = jax.lax.dot_general(
        x,
        K.astype(x.dtype),
        dimension_numbers=(((4,), (0,)), ((), ())),
    )  # (B, T, H, W, 27)
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = jnp.zeros((B, T, H, W), x.dtype)
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                tap = (dt * 3 + dh) * 3 + dw
                y = y + zp[:, dt : dt + T, dh : dh + H, dw : dw + W, tap]
    if bias is not None:
        y = y + bias.reshape(())
    return y


def max_pool_same_zero_pad(x: jax.Array, kernel, stride) -> jax.Array:
    """Max pool with TF-SAME *zero* padding, channels-last.

    The reference zero-pads then max-pools (models/pytorch_i3d.py:21-45).
    Zero padding (not -inf) is part of its numerics; its pool inputs are
    post-ReLU so the two coincide there, but we keep the exact semantics.
    """
    n = x.ndim - 2
    kernel = _tuple(kernel, n)
    stride = _tuple(stride, n)
    pads = [(0, 0)] + [
        same_pads(x.shape[1 + i], kernel[i], stride[i]) for i in range(n)
    ] + [(0, 0)]
    x = jnp.pad(x, pads, mode="constant", constant_values=0.0)
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, *kernel, 1),
        window_strides=(1, *stride, 1),
        padding="VALID",
    )

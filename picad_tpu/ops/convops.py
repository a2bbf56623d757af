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

import jax
import jax.numpy as jnp
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


def max_pool_same_zero_pad(x: jax.Array, kernel, stride) -> jax.Array:
    """Max pool with TF-SAME *zero* padding, channels-last.

    The reference zero-pads then max-pools (models/pytorch_i3d.py:21-45).
    Zero padding (not -inf) is part of its numerics; its pool inputs are
    post-ReLU so the two coincide there, but we keep the exact semantics.

    STRIDE-1 pools are computed SEPARABLY: one 1-D max stage per
    >1-kernel axis (max is associative, and zero-padding an axis at its
    own stage equals the joint zero-padded window — identical forward
    values).  The win is the backward: per-axis stages route gradients
    with k taps per axis (3 + 3 [+ 3]) instead of the 27-tap joint
    stencil that cost ~3.4 ms/step.

    STRIDED pools keep the joint reduce_window with XLA's
    select-and-scatter backward: a separable parity-interleave backward
    was tried and measured WORSE (~+3 ms/step) — the phase
    stack+reshape interleave at the 112^2 stride-2 pool generates
    layout copies that dwarf the ~1.5 ms select-and-scatter it
    replaced.

    Gradient semantics are "all-max per stage" subgradient routing vs
    torch's joint first-max.  KNOWN DEVIATION: the two differ on
    in-window ties.  Ties at ReLU zeros are harmless (the preceding
    ReLU's backward zeroes those taps anyway), but equal POSITIVE
    activations can occur — e.g. duplicated maxima propagated by
    overlapping pools — and there all-max routing sends the window
    gradient to every tied position (counted once per stage-path) where
    torch picks one.  Both are valid subgradients of the same loss; the
    training-dynamics difference is accepted and documented rather than
    hidden behind per-window match-count divides.
    """
    n = x.ndim - 2
    kernel = _tuple(kernel, n)
    stride = _tuple(stride, n)
    if any(s != 1 for s in stride):
        return _max_pool_joint(x, kernel, stride)
    for a in range(n):
        if kernel[a] != 1:
            x = _max_pool_axis(x, a + 1, kernel[a], 1)
    return x


def _max_pool_joint(x, kernel, stride):
    """Joint zero-padded max pool (strided pools; default XLA backward)."""
    n = x.ndim - 2
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _max_pool_axis(x: jax.Array, axis: int, k: int, s: int) -> jax.Array:
    return _max_pool_axis_raw(x, axis, k, s)


def _max_pool_axis_raw(x, axis, k, s):
    size = x.shape[axis]
    lo, hi = same_pads(size, k, s)
    pads = [(0, 0, 0)] * x.ndim
    pads[axis] = (lo, hi, 0)
    xp = lax.pad(x, jnp.array(0.0, x.dtype), pads)
    window = [1] * x.ndim
    window[axis] = k
    strides = [1] * x.ndim
    strides[axis] = s
    return lax.reduce_window(
        xp, -jnp.inf, lax.max, window, strides, padding="VALID"
    )


def _max_pool_axis_fwd(x, axis, k, s):
    y = _max_pool_axis_raw(x, axis, k, s)
    return y, (x, y)


def _shift_axis(t, axis, shift, fill=0.0):
    """t shifted by `shift` along axis (t[..., i, ...] -> value from
    i - shift), zero-filled — a pad + slice, no scatter."""
    if shift == 0:
        return t
    pads = [(0, 0, 0)] * t.ndim
    pads[axis] = (max(shift, 0), max(-shift, 0), 0)
    tp = lax.pad(t, jnp.array(fill, t.dtype), pads)
    start = [0] * t.ndim
    start[axis] = max(-shift, 0)
    limit = list(tp.shape)
    limit[axis] = start[axis] + t.shape[axis]
    return lax.slice(tp, start, limit)


def _max_pool_axis_bwd(axis, k, s, res, g):
    """dx[i] = sum over windows j containing i of 1[x[i] == y[j]] * g[j].

    Stride-1 only (strided pools route through _max_pool_joint): window
    j covers input positions j - lo + t, t in [0, k), so the backward is
    k shifted compare-accumulate passes — pads and slices, no scatters.
    """
    assert s == 1, "strided pools use _max_pool_joint (XLA backward)"
    x, y = res
    lo, _ = same_pads(x.shape[axis], k, s)
    gf = g.astype(jnp.float32)
    acc = jnp.zeros(x.shape, jnp.float32)
    for t in range(k):
        shift = t - lo  # i = j + t - lo  =>  tap j = i - (t - lo)
        ys = _shift_axis(y, axis, shift, fill=-jnp.inf)
        gs = _shift_axis(gf, axis, shift)
        acc = acc + (x == ys).astype(jnp.float32) * gs
    return (acc.astype(x.dtype),)


_max_pool_axis.defvjp(_max_pool_axis_fwd, _max_pool_axis_bwd)



"""Building-block layers with torch-matched numerics, flax.linen modules.

- `TorchBatchNorm`: nn.BatchNorm3d(eps=1e-3, momentum=0.01) semantics
  (reference models/pytorch_i3d.py:80): normalization uses biased batch
  variance; running stats update with factor `momentum` toward the batch
  stat, and the running *variance* uses the unbiased batch variance
  (torch behaviour).  flax's stock BatchNorm differs on the unbiased
  running-var update, so we implement it explicitly.
- `Dropout3d`: channelwise dropout (zero whole channels, scale by
  1/(1-p)), as used at models/capsules_ucf101.py:371,428,507.
- `Unit3D`: Conv3d(TF-SAME dynamic padding, no bias) + BN + ReLU
  (models/pytorch_i3d.py:48-120).

Parameters are stored in f32; convolutions cast to `compute_dtype`
(bf16 by default on TPU) with f32 accumulation on the MXU.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from picad_tpu.ops.convops import conv_nd


class TorchBatchNorm(nn.Module):
    """BatchNorm over the channel (last) axis with torch running-stat rules."""

    momentum: float = 0.01
    epsilon: float = 1e-3
    use_running_average: bool | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            n = 1
            for a in reduce_axes:
                n *= x.shape[a]
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)  # biased
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(x.dtype)


class Dropout3d(nn.Module):
    """Channelwise dropout: zeroes entire channels of (B, ..., C) maps."""

    rate: float = 0.5
    deterministic: bool | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool | None = None):
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        mask = jax.random.bernoulli(rng, p=keep, shape=mask_shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Unit3D(nn.Module):
    """Conv3d (TF-SAME, bias optional) + optional BN + optional ReLU."""

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_batch_norm: bool = True
    use_bias: bool = False
    activation: Callable | None = jax.nn.relu
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        k = tuple(self.kernel)
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*k, cin, self.features),
            jnp.float32,
        )
        y = conv_nd(
            x.astype(self.compute_dtype),
            w.astype(self.compute_dtype),
            stride=tuple(self.stride),
            padding="SAME",
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b
        if self.use_batch_norm:
            y = TorchBatchNorm(name="bn")(y, use_running_average=not train)
        if self.activation is not None:
            y = self.activation(y)
        return y

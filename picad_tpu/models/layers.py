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

import os
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from picad_tpu.ops import bn_stats
from picad_tpu.ops.convops import conv_nd

# One-pass BN batch stats instead of the two-pass E[(x - E[x])^2].
# Hardware-A/B'd ON like every default here (tools/ab_tapconv.py
# --bn-onepass, v5e, full train step: two runs, -2.7 / -3.8 ms of a
# ~73 ms step — the 112^2 encoder BN stats drop one whole HBM read of
# x, because the two-pass var needs the mean reduction to finish
# before it can read x again).
#
# The TEXTBOOK one-pass form var = E[x^2] - E[x]^2 is NOT used: it
# failed the train-mode golden test on hardware (loss off by rtol
# 3.3e-4 vs the 1e-4 gate — catastrophic cancellation when a channel
# has |mean| ~ std, which post-conv pre-BN activations do have at
# init).  Instead we use the SHIFTED one-pass form: subtract a cheap
# per-channel shift c (the mean of a small spatial subsample, under
# stop_gradient), then one fused dual reduction of (x-c) and (x-c)^2.
# var = E[(x-c)^2] - E[x-c]^2 has cancellation amplification
# 1 + (mean-c)^2/var ~ 1 + O(1/subsample), i.e. two-pass-grade
# accuracy, while still reading x once for stats.  The shift is
# mathematically a no-op for both mean and var (and exactly so for
# their gradients, since c is stopped).  Torch parity of THIS path is
# pinned by unit tests that drop _BN_ONEPASS_MIN to 0
# (tests/test_batchnorm.py: cancellation stress, grad-vs-two-pass, and
# the stats_groups=2 fold_flip config); the full-model golden test
# (tests/test_train_parity.py) runs at shapes BELOW the gate, so it
# covers the two-pass form only.
# PICAD_BN_ONEPASS=0 restores the literal torch-form two-pass stats.
_BN_ONEPASS = os.environ.get("PICAD_BN_ONEPASS", "1") == "1"

# Per-spatial-dim subsample stride for the one-pass shift (stride 4 on
# each of T/H/W keeps ~1.6% of a 3-D map, every image region sampled).
_BN_SHIFT_STRIDE = 4

# Only tensors at least this large (element count) take the one-pass
# path; smaller BNs keep the two-pass form.  The HBM read the one-pass
# form saves only matters on the few big stem/skip BNs, while its shift
# reduce adds a fixed launch + serialization cost to every BN — ~40 of
# the model's BNs are small enough that the overhead exceeds the saved
# read.  Tests drop this to 0 to exercise the one-pass path on tiny
# shapes.
_BN_ONEPASS_MIN = 1 << 22

# Staged (default OFF, flip only on a hardware A/B win): fold rows into
# the lane dimension for the stats reductions when C < 128.  A (G, n, C)
# f32/bf16 array with minor dim C=64 leaves half of every (8, 128)
# vector-register/HBM tile as padding, so the bandwidth-bound stat
# reductions over the 64-channel stem/skip BNs run at half the
# achievable rate.  Reshaping to (G, n/k, k*C) with k = 128//C is a
# contiguous reinterpretation (no data movement if XLA keeps the dense
# layout), the axis-1 reduce fills all 128 lanes, and summing the k
# folds afterwards reproduces the exact same per-channel sums (f32
# reassociation-level deltas only).
_BN_LANEFOLD = os.environ.get("PICAD_BN_LANEFOLD", "0") == "1"


def _lanefold_sums(xs: jax.Array, n: int, c: int):
    """Per-channel (sum(xs), sum(xs^2)) over axis 1 of (G, n, C),
    lane-folded when profitable.  Returns two (G, C) f32 arrays."""
    k = 128 // c if (0 < c < 128 and 128 % c == 0) else 1
    if _BN_LANEFOLD and k > 1 and n % k == 0:
        g = xs.shape[0]
        xw = xs.reshape(g, n // k, k * c)
        s1 = jnp.sum(xw, axis=1).reshape(g, k, c).sum(axis=1)
        s2 = jnp.sum(jnp.square(xw), axis=1).reshape(g, k, c).sum(axis=1)
        return s1, s2
    return jnp.sum(xs, axis=1), jnp.sum(jnp.square(xs), axis=1)


class TorchBatchNorm(nn.Module):
    """BatchNorm over the channel (last) axis with torch running-stat rules.

    `stats_groups > 1` splits the batch axis into that many contiguous
    groups, each normalized by its own statistics, with the running stats
    updated sequentially group-by-group.  This reproduces *exactly* the
    numerics of running the network once per group (the reference's two
    separate forwards for original and flipped clips,
    main_ucf101.py:85-86) while dispatching a single, larger batch.
    """

    momentum: float = 0.01
    epsilon: float = 1e-3
    use_running_average: bool | None = None
    stats_groups: int = 1

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
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            y = (x.astype(jnp.float32) - ra_mean.value) * inv + bias
            return y.astype(x.dtype)

        G = self.stats_groups
        B = x.shape[0]
        assert B % G == 0, (B, G)
        n = (B // G) * int(np.prod(x.shape[1:-1]))
        # stats over a FLAT (G, n, C) view: a single-axis reduction lowers
        # much better than the multi-axis reduce over (B/G, *spatial)
        # (measured several ms/step across the 112^2 encoder BNs)
        xf = x.astype(jnp.float32).reshape(G, n, c)
        if G * n * c >= _BN_ONEPASS_MIN and bn_stats.pallas_stats_active(
            x.shape, G, x.dtype
        ):
            # PICAD_BN_PALLAS (default OFF — lost its full-step A/B by
            # ~0.9 ms, see ops/bn_stats.py): one hand-scheduled Pallas
            # pass streams the RAW x through VMEM and emits both stats
            # with f32 tile accumulators — same shifted numerics and
            # exact analytic gradient as the branch below; oracle-tested
            # in tests/test_bn_stats.py.
            mean_g, var_g = bn_stats.group_stats(x, G)
        elif _BN_ONEPASS and G * n * c >= _BN_ONEPASS_MIN:
            # Shifted one-pass stats (see module comment): E[x-c] and
            # E[(x-c)^2] reduce over the SAME shifted input in one fused
            # multi-output reduction — one HBM read of x for stats.  The
            # shift c (a subsample mean, ~1.6% of the data) makes the
            # E[(x-c)^2] - E[x-c]^2 subtraction cancellation-free; it is
            # stopped, so mean/var gradients are exactly the two-pass ones.
            # The shift is computed from a spatial subsample of the RAW
            # bf16 x (stride 4 per spatial dim, ~1.6% of the data as
            # small strided DMA reads).  Slicing the (G, n, C) f32 view
            # instead (first attempt) made XLA materialize the whole f32
            # convert before slicing — a full extra HBM write+read of x
            # that cost more than the one-pass win (A/B: 77.39 vs 73.04
            # ms two-pass).
            sub = x[
                (slice(None),)
                + tuple(slice(None, None, _BN_SHIFT_STRIDE) for _ in x.shape[1:-1])
                + (slice(None),)
            ]
            shift = jax.lax.stop_gradient(
                jnp.mean(sub.astype(jnp.float32).reshape(G, -1, c), axis=1)
            )  # (G, C)
            xs = xf - shift[:, None, :]
            s1, s2 = _lanefold_sums(xs, n, c)
            m1 = s1 / n  # (G, C), ~0 by construction
            m2 = s2 / n
            mean_g = m1 + shift
            var_g = jnp.maximum(m2 - jnp.square(m1), 0.0)
        else:
            mean_g = jnp.mean(xf, axis=1)  # (G, C)
            var_g = jnp.mean(
                jnp.square(xf - mean_g[:, None, :]), axis=1
            )  # biased, per group
        xg = xf.reshape(G, B // G, *x.shape[1:])
        if not self.is_initializing():
            m = self.momentum
            unbiased_g = var_g * (n / max(n - 1, 1))
            new_mean, new_var = ra_mean.value, ra_var.value
            for g in range(G):  # sequential EMA == per-forward updates
                new_mean = (1 - m) * new_mean + m * mean_g[g]
                new_var = (1 - m) * new_var + m * unbiased_g[g]
            ra_mean.value = new_mean
            ra_var.value = new_var

        inv = jax.lax.rsqrt(var_g + self.epsilon) * scale  # (G, C)
        shape = (G, *([1] * (xg.ndim - 2)), c)
        y = (xg - mean_g.reshape(shape)) * inv.reshape(shape) + bias
        return y.reshape(x.shape).astype(x.dtype)


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
    bn_groups: int = 1

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
        stride = tuple(self.stride)
        if (
            x.ndim == 5
            and x.shape[1] == 1
            and k[0] == 3
            and stride[0] == 1
        ):
            # T=1 with temporal kernel 3 and SAME padding: the edge
            # temporal taps only ever multiply zero padding (Mixed_4b..4f
            # run at T=1), so the op IS a 2-D conv with the center slice.
            # Values identical; edge-slice gradients are exactly zero in
            # torch too, so training matches.  Saves 2/3 of the FLOPs of
            # this whole stage and keeps 4-D layouts.
            y = conv_nd(
                x[:, 0].astype(self.compute_dtype),
                w[1].astype(self.compute_dtype),
                stride=stride[1:],
                padding="SAME",
            )[:, None]
        else:
            y = conv_nd(
                x.astype(self.compute_dtype),
                w.astype(self.compute_dtype),
                stride=stride,
                padding="SAME",
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b
        if self.use_batch_norm:
            y = TorchBatchNorm(name="bn", stats_groups=self.bn_groups if train else 1)(
                y, use_running_average=not train
            )
        if self.activation is not None:
            y = self.activation(y)
        return y

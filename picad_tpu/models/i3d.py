"""Inception-v1 I3D encoder, truncated with multi-scale skip outputs.

TPU-native re-design of the reference I3D (models/pytorch_i3d.py:152-353):
channels-last (B, T, H, W, C), TF-SAME padding computed statically per
call shape, zero-padded same max-pooling, BN(eps=1e-3, momentum=0.01).

The forward returns (final_endpoint, out56, out112) where out56 is the
Conv3d_2c_3x3 activation and out112 the Conv3d_1a_7x7 activation —
the skip tensors consumed by the capsule decoder
(models/pytorch_i3d.py:328-346).

Shape trace for (B, 8, 224, 224, 3) input, final_endpoint='Mixed_4f'
(SURVEY.md §3.2):
  Conv3d_1a_7x7 s(2,2,2) -> (B, 4, 112, 112, 64)   = out112
  MaxPool3d_2a (1,3,3)/(1,2,2) -> (B, 4, 56, 56, 64)
  Conv3d_2b_1x1 -> (B, 4, 56, 56, 64)
  Conv3d_2c_3x3 s(2,1,1) -> (B, 2, 56, 56, 192)    = out56
  MaxPool3d_3a (1,3,3)/(1,2,2) -> (B, 2, 28, 28, 192)
  Mixed_3b -> 256; Mixed_3c -> 480
  MaxPool3d_4a (3,3,3)/(2,1,1) -> (B, 1, 28, 28, 480)
  Mixed_4b..4f -> 512, 512, 512, 528, 832 -> (B, 1, 28, 28, 832)
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

import jax

from picad_tpu.models.layers import TorchBatchNorm, Unit3D
from picad_tpu.ops.convops import max_pool_same_zero_pad

# Endpoint construction order and specs (reference :221-296).
VALID_ENDPOINTS = (
    "Conv3d_1a_7x7",
    "MaxPool3d_2a_3x3",
    "Conv3d_2b_1x1",
    "Conv3d_2c_3x3",
    "MaxPool3d_3a_3x3",
    "Mixed_3b",
    "Mixed_3c",
    "MaxPool3d_4a_3x3",
    "Mixed_4b",
    "Mixed_4c",
    "Mixed_4d",
    "Mixed_4e",
    "Mixed_4f",
    "MaxPool3d_5a_2x2",
    "Mixed_5b",
    "Mixed_5c",
)

_INCEPTION_SPECS = {
    "Mixed_3b": [64, 96, 128, 16, 32, 32],
    "Mixed_3c": [128, 128, 192, 32, 96, 64],
    "Mixed_4b": [192, 96, 208, 16, 48, 64],
    "Mixed_4c": [160, 112, 224, 24, 64, 64],
    "Mixed_4d": [128, 128, 256, 24, 64, 64],
    "Mixed_4e": [112, 144, 288, 32, 64, 64],
    "Mixed_4f": [256, 160, 320, 32, 128, 128],
    "Mixed_5b": [256, 160, 320, 32, 128, 128],
    "Mixed_5c": [384, 192, 384, 48, 128, 128],
}

_POOL_SPECS = {
    "MaxPool3d_2a_3x3": ((1, 3, 3), (1, 2, 2)),
    "MaxPool3d_3a_3x3": ((1, 3, 3), (1, 2, 2)),
    "MaxPool3d_4a_3x3": ((3, 3, 3), (2, 1, 1)),
    "MaxPool3d_5a_2x2": ((2, 2, 2), (2, 2, 2)),
}


class StemS2D(nn.Module):
    """Conv3d_1a_7x7 via space-to-depth: 7^3/s2 conv on 3 channels becomes a
    4^3/s1 conv on 24 channels.

    The naive stem is the slowest conv in the profile: Cin=3 leaves the MXU
    contraction dim ~2% utilized and the (…, 3) layout wastes vector lanes.
    Packing 2x2x2 spatial blocks into channels makes the contraction
    4*4*4*24 = 1536 deep with lane-friendly channel counts — identical
    arithmetic (the kernel is zero-padded 7->8 and re-indexed), ~4x faster.

    Derivation: out[o] = sum_k x[2o + k - 2] w[k] with SAME pads (2,3);
    splitting x by parity p and k = 2j + p gives a stride-1 kernel-4 conv
    with pads (1,2) per dim.  Param shapes match Unit3D ('kernel'
    (7,7,7,3,64), bn submodule) so converted checkpoints load unchanged.
    """

    features: int = 64
    compute_dtype: Any = jnp.float32
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from picad_tpu.ops.convops import conv_nd

        # uint8 input = PRE-PACKED raw pixels (train/step.py packed prep:
        # the 2x2x2 space-to-depth was already applied in uint8, values
        # 0..255).  The /255 normalization folds into the kernel instead:
        # conv(x, w/255) == conv(x/255, w), and the BatchNorm right below
        # absorbs any affine input scale exactly — f32 delta vs the
        # pixel-normalized chain is ~1 ulp (tests/test_packed_prep.py).
        packed = x.dtype == jnp.uint8
        cin = (x.shape[-1] // 8) if packed else x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 7, cin, self.features),
            jnp.float32,
        )
        dt = self.compute_dtype
        if packed:
            xp = x.astype(dt)  # 0..255 ints, exact in bf16 (8 significand bits)
            w_eff = w * (1.0 / 255.0)
        else:
            B, T, H, W, C = x.shape
            assert T % 2 == 0 and H % 2 == 0 and W % 2 == 0, (T, H, W)
            xc = x.astype(dt)
            # pack 2x2x2 blocks into channels: (B, T/2, H/2, W/2, 8*C)
            xp = xc.reshape(B, T // 2, 2, H // 2, 2, W // 2, 2, C)
            xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
                B, T // 2, H // 2, W // 2, 8 * C
            )
            w_eff = w
        # kernel: pad 7->8, split parity: (4,4,4, 8*C, F)
        wp = jnp.pad(w_eff.astype(dt), ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
        wp = wp.reshape(4, 2, 4, 2, 4, 2, cin, self.features)
        wp = wp.transpose(0, 2, 4, 1, 3, 5, 6, 7).reshape(
            4, 4, 4, 8 * cin, self.features
        )
        y = conv_nd(xp, wp, 1, [(1, 2), (1, 2), (1, 2)])
        y = TorchBatchNorm(name="bn", stats_groups=self.bn_groups if train else 1)(
            y, use_running_average=not train
        )
        return jax.nn.relu(y)


class InceptionModule(nn.Module):
    """4-branch inception block (reference :124-149).

    Branch order in the concat matches the reference: [1x1, 1x1->3x3,
    1x1->3x3, maxpool->1x1].
    """

    out_channels: Sequence[int]
    compute_dtype: Any = jnp.float32
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.out_channels
        kw = dict(compute_dtype=self.compute_dtype, bn_groups=self.bn_groups)
        b0 = Unit3D(oc[0], (1, 1, 1), name="b0", **kw)(x, train)
        b1 = Unit3D(oc[1], (1, 1, 1), name="b1a", **kw)(x, train)
        b1 = Unit3D(oc[2], (3, 3, 3), name="b1b", **kw)(b1, train)
        b2 = Unit3D(oc[3], (1, 1, 1), name="b2a", **kw)(x, train)
        b2 = Unit3D(oc[4], (3, 3, 3), name="b2b", **kw)(b2, train)
        # T=1: a temporal pool window over zero padding is the identity on
        # post-ReLU (>= 0) inputs — drop to a 2-D pool (3x fewer taps in
        # the tap-loop backward too)
        pool_k = (1, 3, 3) if x.shape[1] == 1 else (3, 3, 3)
        b3 = max_pool_same_zero_pad(x, pool_k, (1, 1, 1))
        b3 = Unit3D(oc[5], (1, 1, 1), name="b3b", **kw)(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class I3DLogitsHead(nn.Module):
    """Classification head for the full I3D (reference :298-321): avg-pool
    (2,7,7)/s1 + dropout + 1x1x1 conv with bias, no BN/act; time-averaged,
    spatially squeezed logits."""

    num_classes: int = 400
    dropout_rate: float = 0.5
    spatial_squeeze: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from jax import lax

        x = lax.reduce_window(
            x,
            0.0,
            lax.add,
            window_dimensions=(1, 2, 7, 7, 1),
            window_strides=(1, 1, 1, 1, 1),
            padding="VALID",
        ) / (2 * 7 * 7)
        if train and self.dropout_rate > 0:
            rng = self.make_rng("dropout")
            keep = 1.0 - self.dropout_rate
            mask = jax.random.bernoulli(rng, keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0)
        x = Unit3D(
            self.num_classes,
            (1, 1, 1),
            use_batch_norm=False,
            use_bias=True,
            activation=None,
            name="logits",
            compute_dtype=self.compute_dtype,
        )(x, train)
        if self.spatial_squeeze:
            x = x.squeeze(axis=(2, 3))  # (B, T', C)
        return x


class InceptionI3d(nn.Module):
    """I3D encoder up to `final_endpoint`, returning multi-scale skips.

    With final_endpoint='Logits' the full Kinetics-style classifier is
    built (reference :298-321, replace_logits :313-321 == re-init with a
    different `num_classes`); `extract_features` (reference :349-353)
    corresponds to final_endpoint='Mixed_5c' + the head's average pool.
    """

    final_endpoint: str = "Mixed_4f"
    num_classes: int = 400
    compute_dtype: Any = jnp.float32
    s2d_stem: bool = True  # space-to-depth first conv (see StemS2D)
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.final_endpoint in VALID_ENDPOINTS + ("Logits",), (
            self.final_endpoint
        )
        dt = self.compute_dtype
        out56 = out112 = None
        even = all(d % 2 == 0 for d in x.shape[1:4])
        if x.dtype == jnp.uint8:  # packed prep path (train/step.py)
            assert self.s2d_stem and even, (
                "packed uint8 input requires the space-to-depth stem"
            )
        for ep in VALID_ENDPOINTS:
            if ep == "Conv3d_1a_7x7":
                if self.s2d_stem and even:
                    x = StemS2D(
                        64, name=ep, compute_dtype=dt, bn_groups=self.bn_groups
                    )(x, train)
                else:
                    x = Unit3D(
                        64, (7, 7, 7), (2, 2, 2), name=ep, compute_dtype=dt,
                        bn_groups=self.bn_groups,
                    )(x, train)
                out112 = x
            elif ep == "Conv3d_2b_1x1":
                x = Unit3D(
                    64, (1, 1, 1), name=ep, compute_dtype=dt,
                    bn_groups=self.bn_groups,
                )(x, train)
            elif ep == "Conv3d_2c_3x3":
                x = Unit3D(
                    192, (3, 3, 3), (2, 1, 1), name=ep, compute_dtype=dt,
                    bn_groups=self.bn_groups,
                )(x, train)
                out56 = x
            elif ep in _POOL_SPECS:
                k, s = _POOL_SPECS[ep]
                x = max_pool_same_zero_pad(x, k, s)
            else:
                x = InceptionModule(
                    _INCEPTION_SPECS[ep], name=ep, compute_dtype=dt,
                    bn_groups=self.bn_groups,
                )(x, train)
            if ep == self.final_endpoint:
                break
        if self.final_endpoint == "Logits":
            x = I3DLogitsHead(
                self.num_classes, compute_dtype=dt, name="head"
            )(x, train)
        return x, out56, out112

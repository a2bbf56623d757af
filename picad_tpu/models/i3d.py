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

from picad_tpu.models.layers import Unit3D
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


class InceptionModule(nn.Module):
    """4-branch inception block (reference :124-149).

    Branch order in the concat matches the reference: [1x1, 1x1->3x3,
    1x1->3x3, maxpool->1x1].
    """

    out_channels: Sequence[int]
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.out_channels
        dt = self.compute_dtype
        b0 = Unit3D(oc[0], (1, 1, 1), name="b0", compute_dtype=dt)(x, train)
        b1 = Unit3D(oc[1], (1, 1, 1), name="b1a", compute_dtype=dt)(x, train)
        b1 = Unit3D(oc[2], (3, 3, 3), name="b1b", compute_dtype=dt)(b1, train)
        b2 = Unit3D(oc[3], (1, 1, 1), name="b2a", compute_dtype=dt)(x, train)
        b2 = Unit3D(oc[4], (3, 3, 3), name="b2b", compute_dtype=dt)(b2, train)
        b3 = max_pool_same_zero_pad(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(oc[5], (1, 1, 1), name="b3b", compute_dtype=dt)(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3d(nn.Module):
    """I3D encoder up to `final_endpoint`, returning multi-scale skips."""

    final_endpoint: str = "Mixed_4f"
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.final_endpoint in VALID_ENDPOINTS, self.final_endpoint
        dt = self.compute_dtype
        out56 = out112 = None
        for ep in VALID_ENDPOINTS:
            if ep == "Conv3d_1a_7x7":
                x = Unit3D(64, (7, 7, 7), (2, 2, 2), name=ep, compute_dtype=dt)(
                    x, train
                )
                out112 = x
            elif ep == "Conv3d_2b_1x1":
                x = Unit3D(64, (1, 1, 1), name=ep, compute_dtype=dt)(x, train)
            elif ep == "Conv3d_2c_3x3":
                x = Unit3D(192, (3, 3, 3), (2, 1, 1), name=ep, compute_dtype=dt)(
                    x, train
                )
                out56 = x
            elif ep in _POOL_SPECS:
                k, s = _POOL_SPECS[ep]
                x = max_pool_same_zero_pad(x, k, s)
            else:
                x = InceptionModule(
                    _INCEPTION_SPECS[ep], name=ep, compute_dtype=dt
                )(x, train)
            if ep == self.final_endpoint:
                break
        return x, out56, out112

"""Model library: I3D encoder + capsule localization head.

Layouts are channels-last (B, T, H, W, C) — TPU-native.  The reference
uses torch channels-first (B, C, T, H, W); the checkpoint converter
(picad_tpu.checkpoint.torch_convert) handles the transposition.
"""

from picad_tpu.models.layers import Dropout3d, TorchBatchNorm, Unit3D
from picad_tpu.models.i3d import InceptionI3d, InceptionModule
from picad_tpu.models.capsules import CapsNet, ConvCaps, PrimaryCaps

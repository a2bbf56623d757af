"""TPU-native op library: torch/TF-semantics wrappers over XLA primitives.

All ops use channels-last layouts (NDHWC / NHWC) — the native layout for
TPU convolutions — while matching the numerical semantics of the PyTorch
ops used by the reference (TF-SAME dynamic padding, ConvTranspose
`output_padding`, zero-padded max-pool, torch BatchNorm running-stat
updates, channelwise Dropout3d).
"""

from picad_tpu.ops.convops import (
    conv_nd,
    conv_transpose_nd,
    max_pool_same_zero_pad,
    same_pads,
)
from picad_tpu.ops.em_routing import em_routing
from picad_tpu.ops.fused_head import fused_decoder_head
from picad_tpu.ops.masks import (
    pixelwise_cyclic_variance,
    pixelwise_gradient,
    temporal_gradient,
)

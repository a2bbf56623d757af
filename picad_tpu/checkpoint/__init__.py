"""Checkpointing: Orbax native checkpoints + torch .pt/.pth converters."""

from picad_tpu.checkpoint.torch_convert import (
    convert_capsnet_state_dict,
    convert_i3d_backbone,
    load_torch_state_dict,
)
from picad_tpu.checkpoint.manager import BestCheckpointPolicy, CheckpointIO

"""Loss and schedule library."""

from picad_tpu.objectives.losses import (
    bce_with_logits,
    dice_loss,
    iou_loss,
    capsule_margin_loss,
    spread_loss,
    weighted_mse_loss,
)
from picad_tpu.objectives.ramp_ups import (
    cosine_rampdown,
    exp_rampdown,
    exp_rampup,
    exp_warmup,
    linear_rampup,
    pseudo_rampup,
)

"""The jitted semi-supervised train step and the validation step.

One XLA program per optimizer step — both forwards (original + flipped
clips), the supervised and consistency losses, both attentive masks, the
backward pass, and the Adam update all fuse into a single device
execution with no host round-trips (the reference's hot loop crosses
host<->device at least three times per step: H2D copies at
main_ucf101.py:52-62 and numpy mask computation in utils/helpers.py).

Loss assembly mirrors train_model_interface (main_ucf101.py:50-150):

- supervised BCE + Dice segmentation losses and the SpreadLoss
  classification loss over *labeled rows only* — the reference gathers
  rows by index (:89-97); we use masked reductions (identical values,
  static shapes);
- the consistency term compares the original forward with the flipped
  forward flipped back (:100), weighted by:
    * all-ones (plain L2, :105-107),
    * temporal cyclic-variance masks in both directions (`--bv`,
      :112-124), ramped against plain L2 by `wt_ramp`,
    * the gradient-smoothness mask (`--gv`, :129-134) — including the
      reference's (B, B, ...) broadcast (losses.weighted_mse_outer);
- consistency applies to ALL rows, labeled included (:100-148);
- total = wt_loc * loc + wt_cls * cls + wt_cons * cons (:148).

BatchNorm batch statistics: with `fold_flip=True` (default) both views
run as one 2B-batch forward while BatchNorm (built with bn_groups=2)
computes per-view statistics and updates running stats sequentially —
bit-for-bit the numerics of the reference's two model() calls at the
dispatch/utilization cost of one.  `fold_flip=False` runs the two
forwards sequentially (identical math, slower).

Both `epoch` and `wt_ramp` are traced scalars, so no retrace across
epochs; the pseudo-label epoch gate is a `jnp.where` inside the model.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import optax

from picad_tpu.config import LossConfig
from picad_tpu.objectives.losses import weighted_mse_outer
from picad_tpu.ops.masks import pixelwise_cyclic_variance, pixelwise_gradient

# Measured LOSS — stays OFF (hardware A/B, v5e full train step,
# tools/ab_tapconv.py --packed, 2026-08-20, two runs: 75.63 / 75.57 ms
# vs the 72.17 / 71.82 ms one-pass-BN comparator it runs on top of —
# reproducibly ~3.5 ms SLOWER).  The round-4 trace's ~10 ms input-prep
# attribution was fused-NEIGHBOR accounting (the same pathology that
# sank the tapconv kernels): the f32 flip/transpose fusions XLA emits
# also carry parts of the stem compute, so removing the prep ops does
# not remove the time — while the uint8 S2D transpose itself vectorizes
# no better (1-byte elements pack 4x more per lane but Mosaic/XLA emit
# sub-word shuffles for the (..., 3)-minor relayout), and the /255-
# folded stem kernel breaks the stem conv out of its producer fusion.
# Kept in-tree as an exact, oracle-tested identity
# (tests/test_packed_prep.py, test_packed_step.py); the hypothesis
# record below documents what was expected and why it was wrong.
#
# Original hypothesis: hand the model PACKED
# uint8 views instead of f32 pixel views.  The round-4 device trace
# showed ~10 ms/step of the ~71 ms step spent on input prep at terrible
# vector-lane efficiency: every op on a (B, 8, 224, 224, 3) tensor uses
# 3 of 128 lanes (the C-minor layout pads 3 -> 128), so the f32
# horizontal flip alone (`reverse`) cost 4.2 ms and the model's
# space-to-depth transposes another ~4.3 ms in bf16.  The packed path
# reorders the SAME ops so the expensive ones touch small/wide data:
#   1. 2x2x2 space-to-depth transpose in uint8 (1 byte/elem, 1/4 the
#      bytes of f32) -> (B, 4, 112, 112, 24);
#   2. horizontal flip = W-reverse + a wp-phase swap of the packed
#      channels (exact: flipping before or after S2D commutes up to
#      that fixed channel permutation), still uint8;
#   3. /255 normalization folds into the stem conv kernel
#      (models/i3d.py StemS2D: conv(x, w/255) == conv(x/255, w) and
#      the BatchNorm right after the conv absorbs any affine scale;
#      f32 delta ~1 ulp, tests/test_packed_prep.py).
# The model detects packed input by dtype (uint8 reaches the stem only
# on this path) and treats the logical clip dims as 2x the packed dims.
_PACKED_PREP = os.environ.get("PICAD_PACKED_PREP", "0") == "1"


def s2d_pack_u8(x: jax.Array) -> jax.Array:
    """2x2x2 space-to-depth on (B, T, H, W, C) uint8 -> (B, T/2, H/2,
    W/2, 8C), channel order (tp, hp, wp, c) — the exact packing
    StemS2D applies to float input (models/i3d.py:111-115)."""
    B, T, H, W, C = x.shape
    xp = x.reshape(B, T // 2, 2, H // 2, 2, W // 2, 2, C)
    xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return xp.reshape(B, T // 2, H // 2, W // 2, 8 * C)


def flip_packed_w(p: jax.Array, c_raw: int = 3) -> jax.Array:
    """Horizontal flip of the ORIGINAL clip, applied to its packed form:
    w_orig = 2w + wp, so flip(w_orig) = 2(W/2-1-w) + (1-wp) — reverse
    the packed W axis and swap the wp phase inside the channel dim."""
    B, T2, H2, W2, C8 = p.shape
    pr = p.reshape(B, T2, H2, W2, 2, 2, 2, c_raw)
    return jnp.flip(pr, axis=(3, 6)).reshape(p.shape)


def prepare_views(batch):
    """(data, aug_data, seg_gt) as f32, normalizing/flipping on device.

    Two sample layouts:
    - reference layout: float32 `data` + precomputed `aug_data`
      (data/dataset.py device_prep=False);
    - TPU uint8 layout: uint8 `data`, no `aug_data` key — /255 and
      the horizontal flip (ucf_dataloader.py:170-175) fuse into the
      step, cutting H2D bytes ~8x.  Numerics identical (same f32 ops).
      Both the host streaming pipeline AND the device-cache assembler
      (data/device_cache.py assemble_batch) produce this layout, so the
      step is one program regardless of input path.  (Fusing the
      device-cache gather into the step was measured ~9 ms/step SLOWER
      than this split — the gather's layouts leaked relayout copies
      into the step body; see assemble_batch.)

    With PICAD_PACKED_PREP=1 the uint8 layout is returned PACKED
    (uint8 space-to-depth views, module comment above); the model
    consumes either form.
    """
    data = batch["data"]
    aug = batch.get("aug_data")
    seg_gt = batch["loc_msk"][..., 0].astype(jnp.float32)  # (B, 8, H, W)
    if (
        _PACKED_PREP
        and aug is None
        and data.dtype == jnp.uint8
        and data.shape[-1] == 3
        and all(d % 2 == 0 for d in data.shape[1:4])
    ):
        p = s2d_pack_u8(data)
        return p, flip_packed_w(p), seg_gt
    if data.dtype == jnp.uint8:
        data = data.astype(jnp.float32) / 255.0
    if aug is None:
        aug = jnp.flip(data, axis=3)
    elif aug.dtype == jnp.uint8:
        aug = aug.astype(jnp.float32) / 255.0
    return data, aug, seg_gt


def _masked_bce(logits, targets, row_mask):
    """BCEWithLogitsLoss over rows where row_mask == 1."""
    x, z = logits, targets
    elem = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    m = row_mask.reshape(-1, *([1] * (elem.ndim - 1)))
    per_elem = elem.size // elem.shape[0]
    denom = jnp.maximum(jnp.sum(row_mask), 1.0) * per_elem
    return jnp.sum(elem * m) / denom


def _masked_dice(logits, targets, row_mask, smooth=1.0):
    """DiceLoss over the flattened labeled rows (losses.py:40-57)."""
    p = jax.nn.sigmoid(logits)
    m = row_mask.reshape(-1, *([1] * (logits.ndim - 1)))
    inter = jnp.sum(p * targets * m)
    dice = (2.0 * inter + smooth) / (
        jnp.sum(p * m) + jnp.sum(targets * m) + smooth
    )
    return 1.0 - dice


def _masked_iou(logits, targets, row_mask, smooth=1.0):
    p = jax.nn.sigmoid(logits)
    m = row_mask.reshape(-1, *([1] * (logits.ndim - 1)))
    inter = jnp.sum(p * targets * m)
    union = jnp.sum(p * m) + jnp.sum(targets * m) - inter
    return 1.0 - (inter + smooth) / (union + smooth)


def _masked_spread(scores, labels, row_mask, m_min=0.2, m_max=0.9):
    """SpreadLoss over labeled rows (losses.py:14-37 incl. double /b)."""
    b, E = scores.shape
    margin = m_min + (m_max - m_min) * 0.0
    at = jnp.take_along_axis(scores, labels.reshape(b, 1), axis=1)
    per = jnp.maximum(margin - (at - scores), 0.0) ** 2  # (B, E)
    n = jnp.maximum(jnp.sum(row_mask), 1.0)
    loss = jnp.sum(per * row_mask[:, None]) / n - margin**2
    return loss / n


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_cfg: LossConfig,
    *,
    fold_flip: bool = False,
    grad_metrics: bool = False,
):
    """Build the (unjitted) train step; caller jits with shardings.

    The step takes PIXEL batches only; the device-cache path assembles
    them in the loader (data/device_cache.py make_assembler_put), so
    one compiled program serves every input path.

    `grad_metrics` adds a `grad_norm` scalar (global L2 of the raw
    gradient pytree) to the metrics — the on-device half of the
    reference's `wandb.watch(model)` gradient hooks (main_jhmdb.py:422).
    Off by default so the production step's compiled program (and the
    persistent XLA cache entries keyed on it) is unchanged."""

    thresh_epoch = loss_cfg.thresh_epoch
    loc_loss_fn = {"dice": _masked_dice, "iou": _masked_iou}[loss_cfg.loc_loss]
    if loss_cfg.const_loss not in ("l2", "jsd", "l1"):
        raise ValueError(f"unknown const_loss {loss_cfg.const_loss!r}")
    if loss_cfg.const_loss != "l2":
        # The reference constructs a jsd/l1 criterion (main_ucf101.py:402-409)
        # but its train_model_interface computes weighted MSE regardless —
        # the selection is dead.  We accept the flags with the same effective
        # behaviour.
        print(
            f"note: const_loss='{loss_cfg.const_loss}' behaves as weighted "
            "MSE, matching the reference's actual computation"
        )

    def forward(params, stats, data, action, flags, epoch, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": stats},
            data,
            action,
            flags,
            epoch,
            thresh_epoch,
            True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        return out, mutated["batch_stats"]

    def loss_fn(params, stats, batch, epoch, wt_ramp, rng1, rng2):
        data, aug, seg_gt = prepare_views(batch)
        action = batch["action"].astype(jnp.int32)
        flags = batch["label_vid"].astype(jnp.float32)
        # row_mask marks real rows: the ragged final batch of an epoch is
        # zero-padded to the compiled batch size (reference DataLoader
        # keeps partial batches, drop_last=False) and padded rows must not
        # contribute to any reduction.  Known deviation: BatchNorm batch
        # statistics on that one batch include the zero rows (the
        # reference normalizes over the true smaller batch); with BN
        # momentum 0.01 and one ragged batch per epoch the running-stat
        # effect is negligible.
        row_mask = batch.get("row_mask")
        if row_mask is None:
            row_mask = jnp.ones_like(flags)
        row_mask = row_mask.astype(jnp.float32)
        lm = flags * row_mask  # 1.0 for real labeled rows

        if fold_flip:
            # First half = original view, second half = flipped view; the
            # model's BatchNorm must be built with bn_groups=2 so each view
            # normalizes with its own statistics (exact reference parity).
            both = jnp.concatenate([data, aug], axis=0)
            action2 = jnp.concatenate([action, action], axis=0)
            flags2 = jnp.concatenate([flags, flags], axis=0)
            (seg_all, scores_all, _), stats = forward(
                params, stats, both, action2, flags2, epoch, rng1
            )
            b = data.shape[0]
            output, flip_op = seg_all[:b], seg_all[b:]
            scores = scores_all[:b]
        else:
            (output, scores, _), stats = forward(
                params, stats, data, action, flags, epoch, rng1
            )
            (flip_op, _, _), stats = forward(
                params, stats, aug, action, flags, epoch, rng2
            )

        # ---- supervised ----
        loc1 = _masked_bce(output, seg_gt, lm)
        loc2 = loc_loss_fn(output, seg_gt, lm)
        loc_loss = loc1 + loc2
        cls_loss = _masked_spread(
            scores, action, lm, loss_cfg.spread_m_min, loss_cfg.spread_m_max
        )

        # ---- consistency (all REAL rows; reference applies it to every
        # row, labeled included, main_ucf101.py:100-148) ----
        rm_b = row_mask.reshape(-1, *([1] * (output.ndim - 1)))

        def masked_mean(x):
            per_elem = x.size // x.shape[0]
            denom = jnp.maximum(jnp.sum(row_mask), 1.0) * per_elem
            return jnp.sum(x * rm_b) / denom

        flipped_pred = jnp.flip(flip_op, axis=3)  # undo spatial flip
        diff_sq = (flipped_pred - output) ** 2
        loss_simple_l2 = masked_mean(diff_sq)

        cons = None
        if loss_cfg.bv:
            sg = jax.lax.stop_gradient
            clck = pixelwise_cyclic_variance(
                sg(output),
                sg(jnp.flip(flipped_pred, axis=1)),
                window=loss_cfg.n_frames,
                use_sigmoid=loss_cfg.predict_maps,
            )
            anticlck = pixelwise_cyclic_variance(
                sg(jnp.flip(output, axis=1)),
                sg(flipped_pred),
                window=loss_cfg.n_frames,
                use_sigmoid=loss_cfg.predict_maps,
            )
            loss_var_1 = masked_mean(clck * diff_sq)
            loss_var_2 = masked_mean(jnp.flip(anticlck, axis=1) * diff_sq)
            cons_bv = wt_ramp * (loss_var_1 + loss_var_2) + (
                1.0 - wt_ramp
            ) * loss_simple_l2
            cons = cons_bv
        if loss_cfg.gv:
            grad_w = jax.lax.stop_gradient(
                pixelwise_gradient(
                    output,
                    conf_thresh_lower=loss_cfg.lower_thresh,
                    conf_thresh_upper=loss_cfg.upper_thresh,
                )
            )
            cons_gv = weighted_mse_outer(
                flipped_pred, output, grad_w, row_mask=row_mask
            )
            if loss_cfg.bv:
                cons = loss_cfg.bv_wt * cons_bv + loss_cfg.gv_wt * cons_gv
            else:
                cons = cons_gv
        if cons is None:
            cons = loss_simple_l2

        total = (
            loss_cfg.wt_loc * loc_loss
            + loss_cfg.wt_cls * cls_loss
            + loss_cfg.wt_cons * cons
        )
        correct = (jnp.argmax(scores, axis=1) == action.reshape(-1)).astype(
            jnp.float32
        )
        acc = jnp.sum(correct * row_mask) / jnp.maximum(jnp.sum(row_mask), 1.0)
        metrics = {
            "loss": total,
            "loss_seg": loc_loss,
            "loss_cls": cls_loss,
            "loss_consistency": cons,
            "acc": acc,
        }
        return total, (stats, metrics)

    def train_step(state, batch, epoch, wt_ramp):
        rng, rng1, rng2 = jax.random.split(state.rng, 3)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, epoch, wt_ramp, rng1,
            rng2,
        )
        if grad_metrics:
            metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
            rng=rng,
        )
        return new_state, metrics

    return train_step


def make_val_step(model, loss_cfg: LossConfig):
    """Validation step (val_model_interface, main_ucf101.py:33-47):
    eval-mode forward, losses over all valid rows, binarized masks for IoU.

    `row_mask` marks real rows: the final partial batch is zero-padded to
    the compiled batch size and masked out, so ragged epochs compile one
    program while every sample still counts exactly once (the reference's
    DataLoader keeps partial final batches)."""

    loc_loss_fn = {"dice": _masked_dice, "iou": _masked_iou}[loss_cfg.loc_loss]

    def val_step(state, batch, row_mask):
        data, _, seg_gt = prepare_views(batch)
        action = batch["action"].astype(jnp.int32)
        b = data.shape[0]

        seg, scores, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            data,
            action,
            jnp.zeros((b,), jnp.float32),
            0,
            0,
            False,
        )
        cls_loss = _masked_spread(
            scores, action, row_mask, loss_cfg.spread_m_min, loss_cfg.spread_m_max
        )
        loc = _masked_bce(seg, seg_gt, row_mask) + loc_loss_fn(
            seg, seg_gt, row_mask
        )
        total = loc + cls_loss
        correct = (jnp.argmax(scores, axis=1) == action.reshape(-1)).astype(
            jnp.float32
        )
        acc = jnp.sum(correct * row_mask) / jnp.maximum(jnp.sum(row_mask), 1.0)
        # binarize at logits > 0 like main_ucf101.py:255-256
        seg_bin = (seg > 0).astype(jnp.float32)
        metrics = {"loss": total, "loss_seg": loc, "loss_cls": cls_loss, "acc": acc}
        return seg_bin, metrics

    return val_step

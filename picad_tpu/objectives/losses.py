"""Loss functions, numerically matched to the reference (utils/losses.py).

All are pure jnp functions over f32 arrays; they run inside the jitted
train step.

Parity notes:
- `spread_loss` keeps the reference's double `/b` normalization
  (losses.py:33-35): loss = (sum(max(margin - (at - x), 0)^2)/b
  - margin^2) / b, while absloss = sum(max(.9 - (at - x), 0)^2)/b - .81.
  The reference's fixed r=0 makes margin == m_min.
- `dice_loss` flattens over the whole batch (losses.py:44-57), smooth=1.
- `weighted_mse_loss` (losses.py:74-75) follows numpy/torch broadcasting:
  the gradient-mask path passes a (B, T, H, W) weight against a
  5-d (B, 1, T, H, W)-equivalent diff in the reference, which broadcasts
  to a (B, B, ...) outer product; `weighted_mse_outer` computes that
  exact value in O(B) memory via the factorization
  mean_{i,j}[w_j * d_i] = mean_pix[mean_j w_j * mean_i d_i].
- `iou_loss` is referenced by the reference CLI (`--loc_loss iou`,
  main_ucf101.py:396) but missing from its codebase (NameError there);
  we provide the standard soft-Jaccard counterpart of `dice_loss`.
- `capsule_margin_loss` ports the (dead-code) CapsuleLoss (losses.py:61-72)
  for completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spread_loss(
    x: jax.Array, target: jax.Array, *, m_min: float = 0.2, m_max: float = 0.9
) -> tuple[jax.Array, jax.Array]:
    """Margin-based spread loss over class scores.

    Args:
      x: (B, C) class scores; target: (B,) int labels.
    Returns:
      (loss, absloss) scalars, matching losses.py:14-37 (r = 0 fixed).
    """
    b, num_class = x.shape
    target = target.astype(jnp.int32).reshape(b)
    r = 0.0
    margin = m_min + (m_max - m_min) * r
    at = jnp.take_along_axis(x, target[:, None], axis=1)  # (B, 1)
    absloss = jnp.maximum(0.9 - (at - x), 0.0) ** 2
    loss = jnp.maximum(margin - (at - x), 0.0) ** 2
    absloss = jnp.sum(absloss) / b - 0.9**2
    loss = jnp.sum(loss) / b - margin**2
    loss = loss / b  # reference's second /b (losses.py:35)
    return loss, absloss


def dice_loss(logits: jax.Array, targets: jax.Array, smooth: float = 1.0) -> jax.Array:
    """1 - Dice over the sigmoid of logits, flattened over the batch."""
    inputs = jax.nn.sigmoid(logits).reshape(-1)
    targets = targets.reshape(-1)
    intersection = jnp.sum(inputs * targets)
    dice = (2.0 * intersection + smooth) / (
        jnp.sum(inputs) + jnp.sum(targets) + smooth
    )
    return 1.0 - dice


def iou_loss(logits: jax.Array, targets: jax.Array, smooth: float = 1.0) -> jax.Array:
    """Soft-Jaccard loss (the reference's missing `IoULoss`)."""
    inputs = jax.nn.sigmoid(logits).reshape(-1)
    targets = targets.reshape(-1)
    intersection = jnp.sum(inputs * targets)
    union = jnp.sum(inputs) + jnp.sum(targets) - intersection
    return 1.0 - (intersection + smooth) / (union + smooth)


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean binary cross-entropy with logits (nn.BCEWithLogitsLoss)."""
    # max(x, 0) - x*z + log(1 + exp(-|x|)) — the standard stable form.
    x, z = logits, targets
    return jnp.mean(
        jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    )


def weighted_mse_loss(
    input: jax.Array, target: jax.Array, weight: jax.Array
) -> jax.Array:
    """(weight * (input - target)^2).mean() with broadcasting (losses.py:74-75)."""
    return jnp.mean(weight * (input - target) ** 2)


def weighted_mse_outer(
    input: jax.Array,
    target: jax.Array,
    weight: jax.Array,
    row_mask: jax.Array | None = None,
) -> jax.Array:
    """The reference gv path's value without the B^2 blow-up.

    In the reference the (B, T, H, W) gradient weight broadcasts against a
    (B, 1, T, H, W) squared diff to a (B, B, T, H, W) outer product before
    the mean (main_ucf101.py:130-132 with helpers.py:76).  That mean
    factorizes exactly: mean_{i,j,p}[w[j,p] d[i,p]]
    = mean_p[(mean_j w[j,p]) (mean_i d[i,p])].

    row_mask ((B,), 1.0 = real row) restricts both batch means to real
    rows, so zero-padded ragged-batch rows drop out exactly as if the
    batch were physically smaller.
    """
    d = (input - target) ** 2
    d = d.reshape(d.shape[0], *weight.shape[1:])
    if row_mask is None:
        return jnp.mean(jnp.mean(weight, axis=0) * jnp.mean(d, axis=0))
    rm = row_mask.reshape(-1, *([1] * (weight.ndim - 1)))
    n = jnp.maximum(jnp.sum(row_mask), 1.0)
    w_mean = jnp.sum(weight * rm, axis=0) / n
    d_mean = jnp.sum(d * rm, axis=0) / n
    return jnp.mean(w_mean * d_mean)


def capsule_margin_loss(labels: jax.Array, classes: jax.Array) -> jax.Array:
    """Port of the reference's unused CapsuleLoss (losses.py:61-72)."""
    left = jax.nn.relu(0.9 - classes) ** 2
    right = jax.nn.relu(classes - 0.1) ** 2
    return jnp.sum(labels * left + 0.5 * (1.0 - labels) * right)

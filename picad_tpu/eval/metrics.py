"""Scalar metrics (reference utils/metrics.py).

Numpy host-side helpers; the per-step training accuracy is also available
as a jnp op for use inside the jitted step.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_accuracy(class_scores, labels) -> float:
    """argmax accuracy (reference utils/metrics.py:7-13)."""
    scores = np.asarray(class_scores)
    labels = np.asarray(labels).reshape(-1)
    pred = np.argmax(scores, axis=1)
    return float(np.mean(pred == labels))


def accuracy_jnp(class_scores, labels):
    """Same as get_accuracy, as a jittable jnp op."""
    pred = jnp.argmax(class_scores, axis=1)
    return jnp.mean((pred == labels.reshape(-1)).astype(jnp.float32))


def get_accuracy2(predictions, targets, threshold: float = 0.5) -> float:
    """Pixel 'f-measure' accuracy (tp+tn)/(all) at a threshold
    (reference utils/metrics.py:16-25)."""
    p = np.asarray(predictions) > threshold
    t = np.asarray(targets).astype(bool)
    tp = np.sum(p & t)
    tn = np.sum(~p & ~t)
    return float((tp + tn) / p.size)


def binary_mask_iou(gt, pred) -> float:
    """Binary-mask IoU; NaN when gt is empty (reference IOU2, metrics.py:171-193).

    The caller filters NaNs exactly like main_ucf101.py:261-266
    (`if iou == iou`).
    """
    gt = np.asarray(gt)
    pred = np.asarray(pred)
    if gt.sum() <= 0:
        return float("nan")
    inter = np.count_nonzero((gt + pred) == 2)
    union = np.count_nonzero(gt + pred)
    return inter / union

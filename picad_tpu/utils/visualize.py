"""Matplotlib debug/visualization helpers (reference utils/metrics.py:27-123,
195-245 equivalents).

All functions are lazy-importing and headless-safe (Agg backend): they
save to a path when `save` is given, else call plt.show().
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def normalize_image(pic: np.ndarray) -> np.ndarray:
    """Min-max normalize unless the image is identically zero."""
    pic = np.asarray(pic)
    if pic.min() == 0 and pic.max() == 0:
        return pic
    return (pic - pic.min()) / (pic.max() - pic.min())


def show(image, title=".", save=None):
    """Display an image (CHW tensors are transposed to HWC)."""
    image = np.asarray(image)
    if image.ndim == 3 and image.shape[0] in (1, 3):
        image = np.transpose(image, (1, 2, 0))
    plt = _plt()
    f, ax = plt.subplots(figsize=(10, 10))
    ax.imshow(np.squeeze(image))
    ax.set_title(title, fontsize=30)
    _finish(plt, f, save)


def overlay(pred_mask, gt_mask, frame, title=".", save=None):
    """Overlay prediction (autumn) and ground truth (jet) on an RGB frame."""
    plt = _plt()
    pred_masked = np.ma.masked_where(pred_mask == 0, pred_mask)
    gt_masked = np.ma.masked_where(gt_mask == 0, gt_mask)
    f, ax = plt.subplots(figsize=(10, 10))
    ax.imshow(normalize_image(np.asarray(frame)))
    ax.imshow(pred_masked, "autumn", interpolation="none", alpha=0.5)
    ax.imshow(gt_masked, "jet", interpolation="none", alpha=0.5)
    ax.set_title(title, fontsize=30)
    _finish(plt, f, save)


def histogram(arr, num_bins: int = 200, save=None):
    plt = _plt()
    arr = np.asarray(arr).ravel()
    f = plt.figure()
    plt.hist(arr, num_bins, facecolor="blue", alpha=0.5)
    _finish(plt, f, save)


def dump_clip_gif(clip: np.ndarray, path: str, stride: int = 1) -> None:
    """Write a (F, H, W, 3) float clip as a GIF (the reference's eval-loader
    __main__ smoke dump, ucf_dataloader_eval.py:163-187)."""
    import imageio

    with imageio.get_writer(path, mode="I") as writer:
        for i in range(0, clip.shape[0], stride):
            writer.append_data((np.clip(clip[i], 0, 1) * 255).astype(np.uint8))


def _finish(plt, fig, save):
    if save:
        fig.savefig(save, bbox_inches="tight")
        plt.close(fig)
    else:
        plt.show()

"""Eval runner pieces: padded-batch forward and full protocol on synthetic."""

import numpy as np
import pytest

import jax

from picad_tpu.data.dataset import EvalVideoDataset
from picad_tpu.data.sources import SyntheticVideoSource
from picad_tpu.eval.engine import evaluate_dataset


def test_padded_forward_drops_padding_rows():
    """A fake forward records batch shapes; padding must be invisible."""
    from picad_tpu.eval.runner import make_padded_forward

    calls = []

    class FakeModel:
        def apply(self, variables, clips, *a, **k):
            calls.append(clips.shape)
            n = clips.shape[0]
            seg = jax.numpy.zeros((n, clips.shape[1], clips.shape[2], clips.shape[3]))
            scores = jax.numpy.zeros((n, 24))
            return seg, scores, None

    fwd = make_padded_forward(
        FakeModel(), {"params": {}, "batch_stats": {}},
        clip_batch_size=6,
    )
    out_seg, out_scores = fwd(np.zeros((4, 8, 16, 16, 3), np.float32))
    assert out_seg.shape[0] == 4 and out_scores.shape[0] == 4
    assert calls[0][0] == 6  # padded to the compiled batch


def test_evaluate_dataset_perfect_oracle():
    """An oracle forward that returns ground truth must score ~1.0."""
    src = SyntheticVideoSource(3, video_len=24, height=120, width=160,
                               num_classes=5, seed=4)
    ds = EvalVideoDataset(src, clip_shape=(96, 96))

    # Precompute per-video data so the oracle can look up masks by content.
    videos = [ds[i] for i in range(len(ds))]

    def oracle_forward(clips):
        n = clips.shape[0]
        seg = np.zeros(clips.shape[:4], np.float32)
        scores = np.zeros((n, 5), np.float32)
        for i in range(n):
            # actor pixels are bright (>= 120/255); background < 60/255
            seg[i] = (clips[i].max(axis=-1) > 0.3).astype(np.float32)
            # find which video this clip came from via its label-free mask
            scores[i] = 0.0
        # class: use the label of the best-matching video (cheap trick:
        # synthetic labels are deterministic; just mark all classes equal,
        # accuracy is not the target of this test)
        return seg, scores

    summary = evaluate_dataset(
        oracle_forward, ds, n_classes=5, clip_batch_size=4, nan_safe=True
    )
    assert summary["fmAP@0.5"] == pytest.approx(1.0, abs=0.05)
    assert summary["vmAP@0.5"] == pytest.approx(1.0, abs=0.05)


def test_prediction_log_collects_names():
    src = SyntheticVideoSource(2, video_len=24, height=120, width=160,
                               num_classes=3, seed=5)
    ds = EvalVideoDataset(src, clip_shape=(96, 96), return_name=True)

    def fwd(clips):
        n = clips.shape[0]
        return (
            np.ones(clips.shape[:4], np.float32),
            np.tile(np.eye(3)[0], (n, 1)).astype(np.float32),
        )

    log = []
    evaluate_dataset(fwd, ds, n_classes=3, clip_batch_size=4, prediction_log=log)
    assert len(log) == 2
    assert all(rec["video"].startswith("synthetic/") for rec in log)
    assert all(rec["pred"] == 0 for rec in log)

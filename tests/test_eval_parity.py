"""Numeric parity of VideoMetrics against a literal transcription of the
reference metric accumulation loop (evaluate_ucf101.py:150-189) on NOISY
synthetic predictions — the regime where nanmean/mean and threshold
boundary semantics would diverge."""

import numpy as np
import pytest

from picad_tpu.eval.engine import VideoMetrics


def reference_accumulate(videos, n_classes):
    """Literal transcription of evaluate_ucf101.py:66-189 (accumulation +
    summary only; model inference replaced by the provided predictions)."""
    n_correct = 0
    n_vids = np.zeros((n_classes, 1))
    n_tot_frames = np.zeros((n_classes, 1))
    frame_ious = np.zeros((n_classes, 20))
    video_ious = np.zeros((n_classes, 20))
    iou_threshs = np.arange(0, 20, dtype=np.float32) / 20

    for label, pred_label, pred_seg, gt_seg in videos:
        if pred_label == label:
            n_correct += 1
        pred_segmentations = pred_seg.astype(np.int64)
        gt_segmentations = gt_seg.astype(np.int64)
        seg_plus_gt = pred_segmentations + gt_segmentations

        vid_inter, vid_union = 0, 0
        for i in range(gt_segmentations.shape[0]):
            frame_gt = gt_segmentations[i]
            if np.sum(frame_gt) == 0:
                continue
            n_tot_frames[label] += 1
            inter = np.count_nonzero(seg_plus_gt[i] == 2)
            union = np.count_nonzero(seg_plus_gt[i])
            vid_inter += inter
            vid_union += union
            i_over_u = inter / union
            for k in range(iou_threshs.shape[0]):
                if i_over_u >= iou_threshs[k]:
                    frame_ious[label, k] += 1
        n_vids[label] += 1
        i_over_u = vid_inter / vid_union
        for k in range(iou_threshs.shape[0]):
            if i_over_u >= iou_threshs[k]:
                video_ious[label, k] += 1

    fAP = frame_ious / n_tot_frames
    fmAP = np.mean(fAP, axis=0)
    vAP = video_ious / n_vids
    vmAP = np.mean(vAP, axis=0)
    accuracy = n_correct / np.sum(n_vids)
    return accuracy, fmAP, vmAP


def make_noisy_videos(n_classes, n_videos, seed):
    """Synthetic noisy prediction/gt pairs: blobby gt, perturbed preds
    (shifted + salt noise + wrong class labels ~30% of the time)."""
    rng = np.random.default_rng(seed)
    videos = []
    for _ in range(n_videos):
        label = int(rng.integers(0, n_classes))
        pred_label = label if rng.random() > 0.3 else int(
            rng.integers(0, n_classes)
        )
        f, h, w = 8, 32, 32
        gt = np.zeros((f, h, w, 1), np.int64)
        for i in range(f):
            if rng.random() < 0.2:
                continue  # some gt-empty frames (skipped by the loop)
            y, x = rng.integers(2, h - 12), rng.integers(2, w - 12)
            gt[i, y : y + 10, x : x + 10] = 1
        # noisy pred: gt shifted a bit + random salt
        shift = int(rng.integers(-3, 4))
        pred = np.roll(gt, shift, axis=1)
        salt = (rng.random(gt.shape) < 0.05).astype(np.int64)
        pred = np.clip(pred + salt, 0, 1)
        videos.append((label, pred_label, pred, gt))
    return videos


@pytest.mark.parametrize("seed", [0, 47])
def test_video_metrics_matches_reference_transcription(seed):
    n_classes = 5
    videos = make_noisy_videos(n_classes, 40, seed)

    ref_acc, ref_fmAP, ref_vmAP = reference_accumulate(videos, n_classes)

    m = VideoMetrics(n_classes)
    for label, pred_label, pred, gt in videos:
        m.update(label, pred_label, pred, gt)
    s = m.summarize()

    assert s["accuracy"] == pytest.approx(ref_acc)
    np.testing.assert_allclose(s["fmAP"], ref_fmAP, rtol=0, atol=0)
    np.testing.assert_allclose(s["vmAP"], ref_vmAP, rtol=0, atol=0)


def test_video_metrics_nan_propagation_matches_reference():
    """A class with zero test videos: reference np.mean -> NaN everywhere."""
    n_classes = 6  # class 5 never appears in 40 videos of classes 0..4
    videos = make_noisy_videos(5, 40, seed=1)
    ref_acc, ref_fmAP, ref_vmAP = reference_accumulate(videos, n_classes)
    assert np.all(np.isnan(ref_fmAP))

    m = VideoMetrics(n_classes)
    for label, pred_label, pred, gt in videos:
        m.update(label, pred_label, pred, gt)
    s = m.summarize()
    assert np.all(np.isnan(s["fmAP"])) and np.all(np.isnan(s["vmAP"]))
    assert s["accuracy"] == pytest.approx(ref_acc)
    # nan_safe opt-out is finite
    assert np.isfinite(m.summarize(nan_safe=True)["fmAP@0.5"])

"""Data pipeline: sampling rules, batcher composition, eval chunking."""

import numpy as np
import pytest

from picad_tpu.data.dataset import ClipDataset, EvalVideoDataset
from picad_tpu.data.loader import SemiSupervisedBatcher
from picad_tpu.data.sources import (
    SyntheticVideoSource,
    rasterize_boxes,
    rasterize_keyframe_boxes,
)
from picad_tpu.eval.clips import chunk_video_into_clips
from picad_tpu.eval.engine import VideoMetrics


def _small_ds(train=True, n=6, labeled=1.0, seed=0):
    src = SyntheticVideoSource(
        n, video_len=40, height=120, width=160, labeled_fraction=labeled, seed=seed
    )
    return ClipDataset(src, train=train, clip_shape=(96, 96), seed=seed)


def test_clip_sample_shapes_and_ranges():
    ds = _small_ds()
    s = ds[0]
    assert s["data"].shape == (8, 96, 96, 3)
    assert s["aug_data"].shape == (8, 96, 96, 3)
    assert s["loc_msk"].shape == (8, 96, 96, 1)
    assert s["data"].dtype == np.float32
    assert 0.0 <= s["data"].min() and s["data"].max() <= 1.0
    assert set(np.unique(s["loc_msk"])).issubset({0.0, 1.0})
    # aug_data is the horizontal flip
    np.testing.assert_array_equal(s["aug_data"], s["data"][:, :, ::-1, :])


def test_clip_sampling_deterministic_per_epoch():
    ds = _small_ds()
    ds.set_epoch(1)
    a = ds[2]
    ds.set_epoch(1)
    b = ds[2]
    np.testing.assert_array_equal(a["data"], b["data"])
    ds.set_epoch(2)
    c = ds[2]
    assert not np.array_equal(a["data"], c["data"])  # new crop/frame choice


def test_zero_sample_on_decode_failure():
    class FailingSource:
        def __len__(self):
            return 1

        def load(self, i):
            return None

    ds = ClipDataset(FailingSource(), train=True, clip_shape=(96, 96))
    s = ds[0]
    assert s["label_vid"] == 0
    assert s["data"].sum() == 0


def test_batcher_composition():
    lab = _small_ds(labeled=1.0, seed=1)
    unl = _small_ds(labeled=0.0, seed=2)
    b = SemiSupervisedBatcher(lab, unl, batch_size=4, seed=0, workers=2)
    assert b.steps_per_epoch() == len(unl) // 2
    batches = list(b.epoch(1))
    assert len(batches) == b.steps_per_epoch()
    for batch in batches:
        assert batch["data"].shape[0] == 4
        # synthetic labeled_fraction drives flags: 2 labeled + 2 unlabeled rows
        assert batch["label_vid"].sum() == 2


def test_batcher_keeps_ragged_final_batch():
    """drop_last=False (reference DataLoader default): the final partial
    unlabeled batch is kept, zero-padded, and row-masked."""
    lab = _small_ds(labeled=1.0, seed=1)          # 6 videos
    unl = _small_ds(n=7, labeled=0.0, seed=2)     # 7 -> 3 full + 1 ragged
    b = SemiSupervisedBatcher(lab, unl, batch_size=4, seed=0, workers=2)
    assert b.steps_per_epoch() == 4  # ceil(7 / 2)
    batches = list(b.epoch(1))
    assert len(batches) == 4
    total_real = 0
    for batch in batches:
        assert batch["data"].shape[0] == 4
        assert batch["row_mask"].shape == (4,)
        real = batch["row_mask"].astype(bool)
        total_real += int(real.sum())
        # padded rows are all-zero and flagged unlabeled
        assert batch["data"][~real].sum() == 0
        assert batch["label_vid"][~real].sum() == 0
    # 4 batches x 2 labeled + 7 unlabeled = 15 real rows
    assert total_real == 4 * 2 + 7

    b_drop = SemiSupervisedBatcher(
        lab, unl, batch_size=4, seed=0, workers=2, drop_last=True
    )
    assert b_drop.steps_per_epoch() == 3
    assert all(
        bt["row_mask"].all() for bt in b_drop.epoch(1)
    )


def test_batcher_force_stream_flags():
    lab = _small_ds(labeled=0.0, seed=1)  # flags all 0 in the records
    unl = _small_ds(labeled=1.0, seed=2)  # flags all 1 in the records
    b = SemiSupervisedBatcher(
        lab, unl, batch_size=4, seed=0, workers=1, force_stream_flags=True
    )
    batch = next(iter(b.epoch(1)))
    assert batch["label_vid"].sum() == 2  # forced per-stream


def test_chunk_video_into_clips_indices():
    F, H, W = 20, 4, 4
    video = np.arange(F, dtype=np.float32).reshape(F, 1, 1, 1)
    video = np.broadcast_to(video, (F, H, W, 3)).copy()
    mask = np.ones((F, H, W, 1), np.uint8)
    clips, masks = chunk_video_into_clips(video, mask)
    # window starts at 0 (j=0: 0,2,..,14; j=1: 1,3,..,15) then 16 (j=0:
    # 16,18,0pad...; j=1: 17,19,0pad...)
    assert clips.shape[0] == 4
    np.testing.assert_array_equal(clips[0, :, 0, 0, 0], np.arange(0, 16, 2))
    np.testing.assert_array_equal(clips[1, :, 0, 0, 0], np.arange(1, 17, 2))
    np.testing.assert_array_equal(
        clips[2, :, 0, 0, 0], [16, 18, 0, 0, 0, 0, 0, 0]
    )


def test_chunk_drops_empty_gt():
    video = np.zeros((16, 4, 4, 3), np.float32)
    mask = np.zeros((16, 4, 4, 1), np.uint8)
    mask[0:8] = 1  # only the first interleaved clip (even frames 0..14) + odd
    clips, masks = chunk_video_into_clips(video, mask)
    assert clips.shape[0] == 2  # both j=0 and j=1 clips touch frames < 8
    mask[:] = 0
    clips, _ = chunk_video_into_clips(video, mask)
    assert clips.shape[0] == 0


def test_video_metrics_hand_computed():
    m = VideoMetrics(n_classes=2)
    gt = np.zeros((2, 4, 4, 1), np.int64)
    gt[0, :2, :2] = 1  # frame 0 nonempty
    pred = np.zeros_like(gt)
    pred[0, :2, :2] = 1  # perfect on frame 0
    m.update(label=0, pred_label=0, pred_seg=pred, gt_seg=gt)
    s = m.summarize(nan_safe=True)
    assert s["accuracy"] == 1.0
    assert s["fmAP@0.5"] == pytest.approx(1.0)  # class 1 absent -> nanmean
    assert s["vmAP@0.5"] == pytest.approx(1.0)
    # reference semantics (np.mean): empty class propagates NaN
    assert np.isnan(m.summarize()["fmAP@0.5"])


def test_rasterize_boxes():
    anns = [(2, 5, 7, [(1, 1, 2, 2)] * 4, [3], 1)]
    mask, label, labeled, keyframes = rasterize_boxes(8, 6, 6, anns)
    assert label == 7 and labeled == 1 and keyframes == [3]
    assert mask[2, 1:3, 1:3].sum() == 4
    assert mask[0].sum() == 0 and mask[6].sum() == 0


def test_rasterize_keyframe_interpolation():
    # box moves from x=0 at frame 0 to x=4 at frame 4
    boxes = [(0, 0, 2, 2), (1, 0, 2, 2), (2, 0, 2, 2), (3, 0, 2, 2), (4, 0, 2, 2)]
    ann = (0, 5, 1, boxes, [0, 4], 1)
    mask = rasterize_keyframe_boxes(6, 8, 8, ann)
    assert mask[0, 0:2, 0:2].sum() == 4
    assert mask[2, 0:2, 2:4].sum() == 4  # interpolated midpoint
    assert mask[4, 0:2, 4:6].sum() == 4


def test_eval_video_dataset_center_crop():
    src = SyntheticVideoSource(2, video_len=20, height=120, width=160, seed=0)
    ds = EvalVideoDataset(src, clip_shape=(96, 96))
    video, mask, label = ds[0]
    assert video.shape == (20, 96, 96, 3)
    assert mask.shape == (20, 96, 96, 1)
    assert 0.0 <= video.min() and video.max() <= 1.0


def test_batcher_multihost_sharding_is_disjoint():
    lab = _small_ds(labeled=1.0, seed=1)
    unl = _small_ds(labeled=0.0, seed=2)
    seen = []
    for pi in range(2):
        b = SemiSupervisedBatcher(
            lab, unl, batch_size=2, seed=0, workers=1,
            process_index=pi, process_count=2,
        )
        order = b._host_shard(
            __import__("numpy").random.default_rng((0, 1)).permutation(len(unl))
        )
        seen.append(set(int(i) for i in order))
    assert seen[0].isdisjoint(seen[1])
    assert seen[0] | seen[1] == set(range(len(unl)))


def test_device_prep_layout_equivalence():
    """uint8 device_prep sample -> prepare_views == reference float sample."""
    import jax.numpy as jnp

    from picad_tpu.train.step import prepare_views

    src = SyntheticVideoSource(2, video_len=24, height=120, width=160, seed=9)
    ref = ClipDataset(src, train=True, clip_shape=(96, 96), seed=3)
    dev = ClipDataset(src, train=True, clip_shape=(96, 96), seed=3,
                      device_prep=True)
    a, b = ref[0], dev[0]
    assert b["data"].dtype == np.uint8
    assert "aug_data" not in b
    batch = {
        "data": jnp.asarray(b["data"][None]),
        "loc_msk": jnp.asarray(b["loc_msk"][None]),
    }
    data, aug, seg_gt = prepare_views(batch)
    np.testing.assert_allclose(np.asarray(data)[0], a["data"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(aug)[0], a["aug_data"], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(seg_gt)[0], a["loc_msk"][..., 0])

"""Reference-exactness of the eval INPUT path (PARITY.md's last mile).

Three input details the metrics can never recover from if wrong:

1. UCF single-annotation choice: the reference draws
   np.random.randint(0, len(anns)) under the global legacy MT19937
   seeded by np.random.seed(47) (evaluate_ucf101.py:36,
   ucf_dataloader_eval.py:135-137), iterating videos in dataset order —
   `test_single_annotation_stream` checks our precomputed table against
   a LITERAL transcription of that loop.
2. JHMDB channel order: the reference's JHMDB loaders append raw cv2
   frames — BGR, never converted (jhmdb_dataloader.py:238-246) —
   `test_jhmdb_channel_order` decodes a real avi both ways.
3. JHMDB eval geometry: the eval loader crops the RAW-resolution video
   and uses the UNRESIZED puppet mask volume
   (jhmdb_dataloader_eval.py:83-140); the 256x256 resize is train-only.
"""

import os
import pickle

import numpy as np
import pytest

from picad_tpu.data.sources import JHMDB_CLASSES, JHMDBVideoSource, UCFVideoSource


def _fake_ucf_pickle(path, ann_counts):
    """Annotation pickle with the given per-video annotation counts."""
    records = []
    for i, n in enumerate(ann_counts):
        anns = [
            (0, 10, i % 24, [[1, 1, 4, 4]] * 11, [2], 1) for _ in range(n)
        ]
        records.append((f"fake/video_{i:04d}", anns))
    with open(path, "wb") as f:
        pickle.dump(records, f)


def test_single_annotation_stream(tmp_path):
    """The choice table == a literal transcription of the reference's
    eval-time draw loop (np.random.seed(seed); per video in dataset
    order, np.random.randint(0, len) only when len > 1)."""
    rng = np.random.default_rng(123)
    ann_counts = [int(c) for c in rng.integers(1, 6, size=200)]
    pkl = tmp_path / "testing_annots.pkl"
    _fake_ucf_pickle(pkl, ann_counts)

    src = UCFVideoSource(
        str(pkl), str(tmp_path), single_annotation=True, annotation_seed=47
    )

    # Literal transcription of the reference (the num_workers=0 stream):
    np.random.seed(47)
    expected = []
    for n in ann_counts:
        if n > 1:
            expected.append(int(np.random.randint(0, n)))
        else:
            expected.append(0)

    assert src._annot_choice == expected
    # and the draw count is right: single-annotation videos consume NO draw
    assert all(c == 0 for c, n in zip(src._annot_choice, ann_counts) if n == 1)
    # a different seed produces a different stream (sanity of the knob)
    src13 = UCFVideoSource(
        str(pkl), str(tmp_path), single_annotation=True, annotation_seed=13
    )
    assert src13._annot_choice != expected


def test_single_annotation_order_independent(tmp_path):
    """The table is fixed at construction, so prefetch access order can
    never perturb the choices (unlike a lazily-advanced stream)."""
    pkl = tmp_path / "t.pkl"
    _fake_ucf_pickle(pkl, [3, 1, 5, 2, 4])
    a = UCFVideoSource(str(pkl), ".", single_annotation=True)
    b = UCFVideoSource(str(pkl), ".", single_annotation=True)
    assert a._annot_choice == b._annot_choice


def test_skvideo_decoder_fails_loud(tmp_path):
    """decoder='skvideo' without scikit-video must raise a helpful
    ImportError, never silently degrade to a zero sample."""
    pytest.importorskip("cv2")
    try:
        import skvideo  # noqa: F401

        pytest.skip("scikit-video present; the gate is not reachable")
    except ImportError:
        pass
    pkl = tmp_path / "t.pkl"
    _fake_ucf_pickle(pkl, [1])
    src = UCFVideoSource(str(pkl), str(tmp_path), decoder="skvideo")
    with pytest.raises(ImportError, match="scikit-video"):
        src.load(0)
    with pytest.raises(ValueError, match="decoder"):
        UCFVideoSource(str(pkl), str(tmp_path), decoder="ffmpeg")


# ---- JHMDB fixtures -------------------------------------------------------


def _write_avi(path, frames_bgr):
    """Write an MJPG avi; returns False if no codec is available."""
    import cv2

    h, w = frames_bgr[0].shape[:2]
    vw = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (w, h)
    )
    if not vw.isOpened():
        return False
    for f in frames_bgr:
        vw.write(f)
    vw.release()
    return os.path.getsize(path) > 0


@pytest.fixture
def jhmdb_tree(tmp_path):
    """A one-video JHMDB layout: golf/clip.avi (240x320, saturated blue
    in BGR terms) + a raw-resolution puppet mask."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from scipy.io import savemat

    h, w, n = 240, 320, 6
    frame = np.zeros((h, w, 3), np.uint8)
    frame[..., 0] = 200  # BGR channel 0 = blue
    frame[..., 2] = 30  # BGR channel 2 = red
    vid_dir = tmp_path / "videos" / "golf"
    vid_dir.mkdir(parents=True)
    if not _write_avi(vid_dir / "clip.avi", [frame] * n):
        pytest.skip("cv2 has no MJPG encoder in this build")

    mask = np.zeros((h, w, n), np.uint8)
    mask[50:150, 100:260, :] = 1
    mask_dir = tmp_path / "masks" / "golf" / "clip"
    mask_dir.mkdir(parents=True)
    savemat(mask_dir / "puppet_mask.mat", {"part_mask": mask})

    lst = tmp_path / "testlist.txt"
    lst.write_text("golf/clip\n")
    return dict(
        list_file=str(lst),
        data_root=str(tmp_path / "videos"),
        mask_root=str(tmp_path / "masks"),
        h=h,
        w=w,
        n=n,
    )


def test_jhmdb_channel_order(jhmdb_tree):
    """channel_order='reference' keeps cv2's BGR (blue-heavy channel 0);
    'rgb' swaps.  MJPEG is lossy, so compare with wide margins."""
    ref = JHMDBVideoSource(
        jhmdb_tree["list_file"], jhmdb_tree["data_root"],
        jhmdb_tree["mask_root"], channel_order="reference",
    ).load(0)
    rgb = JHMDBVideoSource(
        jhmdb_tree["list_file"], jhmdb_tree["data_root"],
        jhmdb_tree["mask_root"], channel_order="rgb",
    ).load(0)
    assert ref is not None and rgb is not None
    m_ref = ref.video.astype(np.float32).mean(axis=(0, 1, 2))
    m_rgb = rgb.video.astype(np.float32).mean(axis=(0, 1, 2))
    # reference order: channel 0 (blue) dominates channel 2 (red)
    assert m_ref[0] > 150 and m_ref[2] < 80, m_ref
    # rgb order: swapped
    assert m_rgb[2] > 150 and m_rgb[0] < 80, m_rgb
    np.testing.assert_allclose(m_ref[::-1], m_rgb, atol=1.0)
    # default IS reference semantics
    dflt = JHMDBVideoSource(
        jhmdb_tree["list_file"], jhmdb_tree["data_root"],
        jhmdb_tree["mask_root"],
    )
    assert dflt.channel_order == "reference"


def test_jhmdb_eval_raw_geometry(jhmdb_tree):
    """resize=None (the eval protocol) returns the raw-resolution video
    and the UNRESIZED transposed puppet mask; resize=256 (the train
    protocol) returns 256x256 both."""
    h, w, n = jhmdb_tree["h"], jhmdb_tree["w"], jhmdb_tree["n"]
    raw = JHMDBVideoSource(
        jhmdb_tree["list_file"], jhmdb_tree["data_root"],
        jhmdb_tree["mask_root"], resize=None,
    ).load(0)
    assert raw.video.shape == (n, h, w, 3)
    assert raw.mask.shape == (n, h, w, 1)
    # mask content survives the transpose: row 50..150, col 100..260
    assert raw.mask[0, 100, 180, 0] == 1
    assert raw.mask[0, 20, 20, 0] == 0
    assert raw.label == JHMDB_CLASSES.index("golf")

    tr = JHMDBVideoSource(
        jhmdb_tree["list_file"], jhmdb_tree["data_root"],
        jhmdb_tree["mask_root"], resize=256,
    ).load(0)
    assert tr.video.shape == (n, 256, 256, 3)
    assert tr.mask.shape == (n, 256, 256, 1)


def test_jhmdb_cache_keys_isolate_variants(jhmdb_tree, tmp_path):
    """BGR/RGB and raw/256 variants must never read each other's
    write-through .npy cache entries."""
    cache = str(tmp_path / "npy_cache")
    variants = [
        dict(channel_order="reference", resize=256),
        dict(channel_order="rgb", resize=256),
        dict(channel_order="reference", resize=None),
    ]
    vids = []
    for kw in variants:
        src = JHMDBVideoSource(
            jhmdb_tree["list_file"], jhmdb_tree["data_root"],
            jhmdb_tree["mask_root"], decoded_cache_dir=cache, **kw,
        )
        vids.append(np.asarray(src.load(0).video))
        # second load comes from the cache and must round-trip
        np.testing.assert_array_equal(np.asarray(src.load(0).video), vids[-1])
    assert vids[0].shape != vids[2].shape
    assert not np.array_equal(vids[0], vids[1])

"""Native clip-assembly library vs the numpy fallback path."""

import numpy as np
import pytest

from picad_tpu.data import _native
from picad_tpu.data.dataset import ClipDataset
from picad_tpu.data.sources import SyntheticVideoSource


@pytest.mark.skipif(not _native.available(), reason="libclip_ops.so not built")
def test_assemble_clip_matches_numpy():
    rng = np.random.default_rng(0)
    F, H, W = 20, 60, 80
    video = rng.integers(0, 256, (F, H, W, 3), dtype=np.uint8)
    mask = (rng.uniform(size=(F, H, W, 1)) > 0.5).astype(np.uint8)
    span = np.array([0, 2, 4, 6, 8, 10, 12, 14], dtype=np.int64)
    valid = np.array([1, 1, 0, 1, 1, 1, 0, 1], dtype=np.uint8)
    y, x, ch, cw = 5, 7, 48, 64

    out, flip, msk = _native.assemble_clip(video, mask, span, valid, y, x, ch, cw)

    ref = video[span, y : y + ch, x : x + cw, :].astype(np.float32) / 255.0
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-7)
    np.testing.assert_allclose(flip, ref[:, :, ::-1, :], rtol=0, atol=1e-7)
    mref = (
        (mask[span, y : y + ch, x : x + cw, :] > 0)
        & valid[:, None, None, None].astype(bool)
    ).astype(np.float32)
    np.testing.assert_array_equal(msk, mref)


@pytest.mark.skipif(not _native.available(), reason="libclip_ops.so not built")
def test_dataset_native_and_numpy_paths_agree():
    src = SyntheticVideoSource(3, video_len=30, height=100, width=120, seed=5)
    kw = dict(train=True, clip_shape=(96, 96), seed=9)
    a = ClipDataset(src, use_native=True, **kw)
    b = ClipDataset(src, use_native=False, **kw)
    assert a._native is not None
    for i in range(3):
        sa, sb = a[i], b[i]
        for k in ("data", "aug_data", "loc_msk"):
            np.testing.assert_allclose(sa[k], sb[k], rtol=0, atol=1e-7, err_msg=k)

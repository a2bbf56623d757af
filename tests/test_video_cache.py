"""Decode-cache paths: in-memory LRU and the pre-decoded .npy cache."""

import numpy as np

from picad_tpu.data.sources import (
    CachedVideoSource,
    SyntheticVideoSource,
    VideoRecord,
    _decode_with_npy_cache,
)


class CountingSource:
    """Wraps a source, counting .load calls."""

    def __init__(self, inner):
        self.inner = inner
        self.loads = 0

    def __len__(self):
        return len(self.inner)

    def load(self, i):
        self.loads += 1
        return self.inner.load(i)


def test_lru_cache_hits_and_identity():
    base = CountingSource(SyntheticVideoSource(4, video_len=10, height=120,
                                               width=160, seed=0))
    src = CachedVideoSource(base, capacity_bytes=1 << 30)
    a = src.load(1)
    b = src.load(1)
    assert base.loads == 1
    np.testing.assert_array_equal(a.video, b.video)
    src.load(2)
    src.load(3)
    assert base.loads == 3


def test_lru_cache_evicts_under_budget():
    base = CountingSource(SyntheticVideoSource(4, video_len=10, height=120,
                                               width=160, seed=0))
    one_rec = base.inner.load(0)
    size = one_rec.video.nbytes + one_rec.mask.nbytes
    src = CachedVideoSource(base, capacity_bytes=2 * size + 16)
    src.load(0)
    src.load(1)
    src.load(2)  # evicts 0
    n = base.loads
    src.load(2)  # hit
    src.load(1)  # hit
    assert base.loads == n
    src.load(0)  # miss again (evicted)
    assert base.loads == n + 1


def test_lru_caches_none_records():
    class Failing:
        def __len__(self):
            return 1

        def load(self, i):
            self.calls = getattr(self, "calls", 0) + 1
            return None

    base = Failing()
    src = CachedVideoSource(base, capacity_bytes=1 << 20)
    assert src.load(0) is None
    assert src.load(0) is None
    assert base.calls == 1  # broken videos are not re-decoded every epoch


def test_npy_cache_roundtrip(tmp_path):
    # no real .avi here: simulate by writing the cache file directly, then
    # verify the memmap read path and that a missing video still decodes
    # (returns None for a nonexistent path with an empty cache).
    video = np.random.default_rng(0).integers(
        0, 255, (12, 32, 32, 3), dtype=np.uint8
    )
    np.save(tmp_path / "vid.npy", video)
    out = _decode_with_npy_cache("/nonexistent.avi", str(tmp_path), "vid")
    assert isinstance(out, np.memmap)
    np.testing.assert_array_equal(np.asarray(out), video)
    assert _decode_with_npy_cache("/nonexistent.avi", str(tmp_path), "other") is None


def test_clip_dataset_over_memmap(tmp_path):
    """ClipDataset (incl. the native fused path) must accept memmapped
    video arrays — only the sampled frames are touched."""
    from picad_tpu.data.dataset import ClipDataset

    rng = np.random.default_rng(1)
    video = rng.integers(0, 255, (30, 120, 160, 3), dtype=np.uint8)
    np.save(tmp_path / "v.npy", video)
    mm = np.load(tmp_path / "v.npy", mmap_mode="r")

    class MMSource:
        def __len__(self):
            return 1

        def load(self, i):
            mask = np.zeros((30, 120, 160, 1), np.uint8)
            mask[:, 20:60, 30:90] = 1
            return VideoRecord(mm, mask, 3, np.arange(4, 26, 4), 1, "mm")

    ds = ClipDataset(MMSource(), train=True, clip_shape=(96, 96), seed=0)
    s = ds[0]
    assert s["data"].shape == (8, 96, 96, 3)
    assert s["data"].dtype == np.float32
    assert 0.0 <= s["data"].min() and s["data"].max() <= 1.0
    assert s["loc_msk"].max() == 1.0
    # flip really flips
    np.testing.assert_allclose(s["aug_data"], s["data"][:, :, ::-1, :])

"""Device-resident video cache: on-device clip assembly must match the
host streaming path bit-for-bit (data/device_cache.py vs data/dataset.py).

Runs on any backend (small shapes; pure gather/elementwise ops).
"""

import numpy as np
import pytest

from picad_tpu.data.dataset import ClipDataset
from picad_tpu.data.device_cache import (
    DeviceClipDataset,
    DeviceVideoCache,
    assemble_clips_on_device,
)
from picad_tpu.data.loader import SemiSupervisedBatcher
from picad_tpu.data.sources import SyntheticVideoSource


def make_source(n=6, labeled=0.5, seed=3):
    return SyntheticVideoSource(
        n, video_len=24, labeled_fraction=labeled,
        seed=seed,
    )


@pytest.fixture(scope="module")
def cache():
    return DeviceVideoCache.build(make_source(), budget_bytes=1 << 30)


def test_sampling_parity_with_host_dataset(cache):
    """Same rng stream => same clip span / crop / flags as ClipDataset."""
    host = ClipDataset(
        make_source(), train=True, clip_shape=(48, 64), device_prep=True,
        seed=5,
    )
    meta = DeviceClipDataset(cache, train=True, clip_shape=(48, 64), seed=5)
    for epoch in (0, 1):
        host.set_epoch(epoch)
        meta.set_epoch(epoch)
        for i in range(len(host)):
            hs = host[i]
            ms = meta[i]
            data, seg = assemble_clips_on_device(
                cache.pool_video,
                cache.pool_mask,
                ms["frame_idx"][None],
                np.asarray([ms["crop_y"]]),
                np.asarray([ms["crop_x"]]),
                ms["valid"][None],
                (48, 64),
            )
            assert np.array_equal(np.asarray(data[0]), hs["data"])
            assert np.array_equal(
                np.asarray(seg[0]), hs["loc_msk"][..., 0].astype(np.float32)
            )
            assert int(ms["action"]) == int(hs["action"])
            assert int(ms["label_vid"]) == int(hs["label_vid"])


def test_assembler_batch_matches_host_streaming_batch(cache):
    """make_assembler_put over metadata batches yields BIT-IDENTICAL
    pixel batches to the host streaming pipeline (same batcher config,
    same seeds) — the invariant that lets the device-cache path reuse
    the streaming path's compiled train-step executable."""
    import jax

    from picad_tpu.data.device_cache import make_assembler_put
    from picad_tpu.data.loader import PrefetchLoader

    def meta_batcher():
        lab = DeviceClipDataset(cache, train=True, clip_shape=(48, 64), seed=1)
        unl = DeviceClipDataset(cache, train=True, clip_shape=(48, 64), seed=2)
        return SemiSupervisedBatcher(
            lab, unl, batch_size=4, seed=0, workers=2,
            process_index=0, process_count=1,
        )

    def host_batcher():
        lab = ClipDataset(
            make_source(), train=True, clip_shape=(48, 64),
            device_prep=True, seed=1,
        )
        unl = ClipDataset(
            make_source(), train=True, clip_shape=(48, 64),
            device_prep=True, seed=2,
        )
        return SemiSupervisedBatcher(
            lab, unl, batch_size=4, seed=0, workers=2,
            process_index=0, process_count=1,
        )

    pools = {"pool_video": cache.pool_video, "pool_mask": cache.pool_mask}
    put = make_assembler_put(pools, (48, 64))
    for epoch in (0, 1):
        dev = list(PrefetchLoader(meta_batcher().epoch(epoch), put_fn=put))
        host = list(host_batcher().epoch(epoch))
        assert len(dev) == len(host) > 0
        for d, h in zip(dev, host):
            assert set(d) == set(h)
            for k in h:
                a = np.asarray(jax.device_get(d[k]))
                np.testing.assert_array_equal(a, h[k], err_msg=k)
                assert a.dtype == h[k].dtype, k


def test_degraded_sample_is_zero(cache):
    """Out-of-range clip spans degrade to the reserved zero frame."""
    meta = DeviceClipDataset(cache, train=True, clip_shape=(48, 64), depth=32)
    s = meta[0]  # 24-frame videos cannot carry a 32-frame clip
    assert np.all(s["frame_idx"] == 0)
    assert int(s["label_vid"]) == 0
    data, seg = assemble_clips_on_device(
        cache.pool_video, cache.pool_mask, s["frame_idx"][None],
        np.asarray([s["crop_y"]]), np.asarray([s["crop_x"]]),
        s["valid"][None], (48, 64),
    )
    assert not np.any(np.asarray(data))
    assert not np.any(np.asarray(seg))


def test_batcher_over_meta_datasets(cache):
    """SemiSupervisedBatcher collates metadata batches (tiny arrays)."""
    lab = DeviceClipDataset(cache, train=True, clip_shape=(48, 64), seed=1)
    unl = DeviceClipDataset(cache, train=True, clip_shape=(48, 64), seed=2)
    b = SemiSupervisedBatcher(
        lab, unl, batch_size=4, seed=0, workers=2,
        process_index=0, process_count=1,
    )
    batches = list(b.epoch(0))
    assert len(batches) == b.steps_per_epoch()
    for batch in batches:
        assert batch["frame_idx"].shape == (4, 8)
        assert batch["frame_idx"].dtype == np.int32
        assert batch["valid"].shape == (4, 8)
        assert batch["row_mask"].shape == (4,)


def test_budget_enforced():
    with pytest.raises(ValueError, match="budget"):
        DeviceVideoCache.build(make_source(), budget_bytes=1 << 20)


@pytest.mark.heavy
def test_train_step_on_device_cache(cache):
    """The PLAIN train step over assembler-produced batches runs and is
    finite — the production device-cache flow (metadata batcher ->
    make_assembler_put on the prefetch thread -> the same step program
    as the streaming path).

    heavy: compiles a full 96^2 CapsNet train step (minutes cold)."""
    import jax
    import jax.numpy as jnp

    from picad_tpu.config import LossConfig
    from picad_tpu.data.device_cache import make_assembler_put
    from picad_tpu.data.loader import PrefetchLoader
    from picad_tpu.models.capsules import CapsNet
    from picad_tpu.train.optimizer import make_optimizer
    from picad_tpu.train.state import create_train_state
    from picad_tpu.train.step import make_train_step

    H = W = 96
    model = CapsNet(num_classes=24, bn_groups=2)
    opt = make_optimizer(1e-4)
    state = create_train_state(
        model, opt, rng=jax.random.PRNGKey(0),
        sample_input_shape=(1, 8, H, W, 3),
    )
    step = jax.jit(
        make_train_step(
            model, opt,
            LossConfig(bv=True, n_frames=5, wt_cons=0.1, thresh_epoch=11),
            fold_flip=True,
        ),
        donate_argnums=(0,),
    )
    lab = DeviceClipDataset(cache, train=True, clip_shape=(H, W), seed=1)
    unl = DeviceClipDataset(cache, train=True, clip_shape=(H, W), seed=2)
    batcher = SemiSupervisedBatcher(
        lab, unl, batch_size=2, seed=0, workers=2,
        process_index=0, process_count=1,
    )
    pools = {"pool_video": cache.pool_video, "pool_mask": cache.pool_mask}
    loader = PrefetchLoader(
        batcher.epoch(0), put_fn=make_assembler_put(pools, (H, W))
    )
    batch = next(iter(loader))
    assert batch["data"].dtype == jnp.uint8
    assert batch["loc_msk"].shape == (2, 8, H, W, 1)
    state, metrics = step(
        state, batch, jnp.asarray(12.0), jnp.asarray(0.5)
    )
    assert np.isfinite(float(metrics["loss"]))

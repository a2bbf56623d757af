"""JHMDB-21 path end-to-end on synthetic data: mask_cls/validity flows
through batching and the jitted train step; per-stream forced flags; the
e<4 checkpoint-deletion gate (main_jhmdb.py:435,444)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from picad_tpu.cli.common import args_to_config, build_parser
from picad_tpu.config import LossConfig
from picad_tpu.data.dataset import ClipDataset
from picad_tpu.data.loader import SemiSupervisedBatcher
from picad_tpu.data.sources import SyntheticVideoSource


def test_jhmdb_config_gates():
    args = build_parser("jhmdb").parse_args(["--synthetic", "--bs", "4"])
    cfg = args_to_config(args, "jhmdb")
    assert cfg.model.num_classes == 21
    assert cfg.keep_all_after_epoch == 4  # main_jhmdb.py:435,444
    ucf = args_to_config(
        build_parser("ucf101").parse_args(["--synthetic", "--bs", "4"]),
        "ucf101",
    )
    assert ucf.keep_all_after_epoch == 20  # main_ucf101.py:444,453


def test_jhmdb_batch_carries_mask_cls():
    def mk(labeled, seed):
        src = SyntheticVideoSource(
            4, video_len=24, height=120, width=160, num_classes=21,
            labeled_fraction=labeled, seed=seed,
        )
        return ClipDataset(
            src, train=True, clip_shape=(96, 96), with_validity=True,
            seed=seed, device_prep=True,
        )

    b = SemiSupervisedBatcher(
        mk(1.0, 1), mk(0.0, 2), batch_size=4, seed=0, workers=1,
        force_stream_flags=True,
    )
    batch = next(iter(b.epoch(1)))
    assert batch["mask_cls"].shape == (4, 8, 96, 96, 1)
    assert batch["label_vid"].sum() == 2  # forced ones/zeros per stream
    # validity folded into loc_msk: invalid frames have empty masks
    valid = batch["mask_cls"][..., 0].max(axis=(2, 3))  # (B, 8)
    msk = batch["loc_msk"][..., 0].max(axis=(2, 3)).astype(np.float32)
    assert np.all(msk <= valid + 1e-6)


@pytest.mark.heavy
def test_jhmdb_train_step_e2e(require_accelerator):
    """Two jitted 21-class train steps over a JHMDB-style synthetic batch
    (mask_cls key present, forced stream flags, uint8 device_prep)."""
    from picad_tpu.models.capsules import CapsNet
    from picad_tpu.train.optimizer import make_optimizer
    from picad_tpu.train.state import create_train_state
    from picad_tpu.train.step import make_train_step

    def mk(labeled, seed):
        src = SyntheticVideoSource(
            4, video_len=24, height=120, width=160, num_classes=21,
            labeled_fraction=labeled, seed=seed,
        )
        return ClipDataset(
            src, train=True, clip_shape=(96, 96), with_validity=True,
            seed=seed, device_prep=True,
        )

    batcher = SemiSupervisedBatcher(
        mk(1.0, 1), mk(0.0, 2), batch_size=4, seed=0, workers=1,
        force_stream_flags=True,
    )
    model = CapsNet(num_classes=21, compute_dtype=jnp.bfloat16, bn_groups=2)
    opt = make_optimizer(1e-4)
    state = create_train_state(
        model, opt, rng=jax.random.PRNGKey(0),
        sample_input_shape=(1, 8, 96, 96, 3),
    )
    step = jax.jit(make_train_step(
        model, opt, LossConfig(bv=True, n_frames=5, wt_cons=0.1),
        fold_flip=True,
    ))
    losses = []
    for i, batch in enumerate(batcher.epoch(1)):
        state, metrics = step(
            state, jax.device_put(batch),
            jnp.asarray(1.0, jnp.float32), jnp.asarray(0.1, jnp.float32),
        )
        losses.append(float(metrics["loss"]))
        if i == 1:
            break
    assert len(losses) == 2 and all(np.isfinite(losses))

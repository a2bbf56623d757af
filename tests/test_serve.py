"""Serving export/load tests (picad_tpu.serve).

The non-heavy tests exercise the artifact machinery — trace, serialize,
reload, padded ragged batching, video chunk/stitch — on a tiny module
with the CapsNet call contract (a full CapsNet CPU trace takes minutes
on this host; the full-model artifact is covered by the heavy test).
"""

import json
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from picad_tpu.serve import load_artifact, save_artifact


class TinySig(nn.Module):
    """CapsNet call signature; seg logit = per-frame channel mean so the
    video stitching test can verify WHICH frame each prediction came
    from (CapsNet: models/capsules.py:253-262 returns (seg_logits,
    class_scores, feat))."""

    num_classes: int = 24

    @nn.compact
    def __call__(self, img, classification, concat_labels, epoch,
                 thresh_epoch, train=False):
        b = img.shape[0]
        seg = img.mean(axis=-1)  # (B, T, H, W)
        pooled = img.mean(axis=(1, 2, 3))  # (B, 3)
        scores = pooled @ self.param(
            "wcls", nn.initializers.normal(0.1), (3, self.num_classes)
        )
        del classification, concat_labels, epoch, thresh_epoch, train
        return seg, scores, None


def _make_artifact(tmp_path, clip_bs=4, hw=16, platforms=None):
    # Default: export for whatever backend this session runs on — an
    # artifact exported for a platform list that excludes the executing
    # backend correctly refuses to run (jax.export's platform check),
    # which is what a hardcoded ("cpu",) did to every call-the-artifact
    # test on TPU-attached sessions.
    if platforms is None:
        platforms = (jax.default_backend(),)
    model = TinySig()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, hw, hw, 3)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,)),
        0,
        0,
        False,
    )
    out = save_artifact(
        str(tmp_path / "artifact"),
        model,
        variables,
        clip_batch_size=clip_bs,
        height=hw,
        width=hw,
        platforms=platforms,
        extra_meta={"test": True},
    )
    return model, variables, out


def test_roundtrip_matches_live_apply(tmp_path):
    model, variables, out = _make_artifact(tmp_path)
    serving = load_artifact(out)
    rng = np.random.default_rng(3)
    # ragged (3 < clip_bs) AND multi-chunk (9 = 2 full + 1 ragged)
    for n in (3, 9):
        clips = rng.random((n, 8, 16, 16, 3), dtype=np.float32)
        seg, scores = serving.predict_clips(clips)
        ref_seg, ref_scores, _ = model.apply(
            variables,
            jnp.asarray(clips),
            jnp.full((n,), 500, jnp.int32),
            jnp.zeros((n,)),
            0,
            0,
            False,
        )
        np.testing.assert_allclose(
            seg, jax.nn.sigmoid(ref_seg), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            scores, np.asarray(ref_scores), rtol=1e-6, atol=1e-6
        )


def test_artifact_layout_and_meta(tmp_path):
    _, _, out = _make_artifact(tmp_path)
    assert os.path.exists(os.path.join(out, "model.stablehlo"))
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert meta["clip_batch_size"] == 4
    assert meta["height"] == meta["width"] == 16
    assert meta["platforms"] == [jax.default_backend()]
    assert meta["num_classes"] == 24
    assert meta["test"] is True


def test_format_version_gate(tmp_path):
    _, _, out = _make_artifact(tmp_path)
    meta_path = os.path.join(out, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["format_version"] = 999
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="format"):
        load_artifact(out)


def test_predict_clips_shape_gate(tmp_path):
    _, _, out = _make_artifact(tmp_path)
    serving = load_artifact(out)
    with pytest.raises(ValueError, match="clip shape"):
        serving.predict_clips(np.zeros((2, 8, 32, 32, 3), np.float32))


def test_predict_video_stitches_frames_back(tmp_path):
    """Each output frame must carry the prediction computed FROM that
    frame.  TinySig's seg is the per-frame channel mean, so frame f of a
    per-frame-constant video must come back as sigmoid(value_f) — for
    every f, including the zero-padded tail window (F=41 is not a
    multiple of depth*f_skip=16)."""
    _, _, out = _make_artifact(tmp_path)
    serving = load_artifact(out)
    n_frames = 41
    vals = np.linspace(-2.0, 2.0, n_frames).astype(np.float32)
    video = np.broadcast_to(
        vals[:, None, None, None], (n_frames, 16, 16, 3)
    ).copy()
    res = serving.predict_video(video)
    want = 1.0 / (1.0 + np.exp(-vals))
    got = res["segmentation"][:, 0, 0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert res["segmentation"].shape == (n_frames, 16, 16, 1)
    assert res["scores"].shape == (24,)
    assert res["pred_label"] == int(np.argmax(res["scores"]))


def test_artifact_drives_eval_protocol(tmp_path):
    """ServingModel.predict_clips satisfies the eval engine's forward_fn
    contract (eval/engine.py:95-115) — the full offline f-mAP/v-mAP
    protocol must run against an artifact and produce the same summary
    as the live padded forward."""
    from picad_tpu.eval.engine import evaluate_dataset
    from picad_tpu.eval.runner import make_padded_forward

    model, variables, out = _make_artifact(tmp_path)
    serving = load_artifact(out)

    rng = np.random.default_rng(11)
    dataset = []
    for i in range(3):
        f = 20 + 7 * i
        video = rng.random((f, 16, 16, 3)).astype(np.float32)
        mask = (rng.random((f, 16, 16, 1)) > 0.4).astype(np.float32)
        dataset.append((video, mask, i % 24))

    kw = dict(n_classes=24, clip_batch_size=4, nan_safe=True)
    summary_art = evaluate_dataset(serving.predict_clips, dataset, **kw)
    live = make_padded_forward(model, variables, clip_batch_size=4)
    summary_live = evaluate_dataset(live, dataset, **kw)
    for k, v in summary_live.items():
        np.testing.assert_allclose(
            summary_art[k], v, rtol=1e-6, atol=1e-8, err_msg=k
        )
    assert 0.0 <= summary_art["vmAP@0.5"] <= 1.0


def test_multiplatform_export_executes_locally(tmp_path):
    """A (tpu, cpu) artifact must be creatable from any host (lowering
    is platform-parameterized) and executable on whichever platform is
    locally available."""
    model, variables, out = _make_artifact(
        tmp_path, platforms=("tpu", "cpu")
    )
    serving = load_artifact(out)
    clips = np.random.default_rng(0).random(
        (2, 8, 16, 16, 3), dtype=np.float32
    )
    seg, scores = serving.predict_clips(clips)
    assert seg.shape == (2, 8, 16, 16)
    assert np.isfinite(seg).all() and np.isfinite(scores).all()


@pytest.mark.heavy
def test_full_capsnet_artifact_parity(tmp_path, require_accelerator):
    """Export the flagship CapsNet at 96^2 and check the artifact
    against the live eval forward (eval/runner.py:make_padded_forward)
    on a random ragged batch.  Both run the pure-XLA f32 chain (the
    export pins Pallas off; the live f32 path never dispatches it,
    ops/fused_head.py:101-118), so tolerance is lowering-noise only."""
    from picad_tpu.eval.runner import make_padded_forward
    from picad_tpu.models.capsules import CapsNet
    from picad_tpu.train.optimizer import make_optimizer
    from picad_tpu.train.state import create_train_state

    model = CapsNet(num_classes=24)
    template = create_train_state(
        model, make_optimizer(), rng=jax.random.PRNGKey(1)
    )
    variables = {
        "params": template.params,
        "batch_stats": template.batch_stats,
    }
    out = save_artifact(
        str(tmp_path / "capsnet"),
        model,
        variables,
        clip_batch_size=4,
        height=96,
        width=96,
        platforms=(jax.default_backend(),),
    )
    serving = load_artifact(out)
    clips = np.random.default_rng(7).random(
        (3, 8, 96, 96, 3), dtype=np.float32
    )
    seg_a, sc_a = serving.predict_clips(clips)
    live = make_padded_forward(model, variables, clip_batch_size=4)
    seg_b, sc_b = live(clips)
    np.testing.assert_allclose(seg_a, seg_b, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sc_a, sc_b, rtol=1e-4, atol=1e-5)

"""--watch observability: the wandb.watch(model) equivalent.

The reference hooks torch modules once at bring-up (main_jhmdb.py:422)
and wandb then logs param/grad magnitudes periodically.  Our split:
`grad_metrics=True` folds a global grad-norm into the jitted step's
metrics, and `MetricLogger.watch_params` histograms per-leaf param
norms to every sink every --pf batches (train/loop.py).
"""

import json
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from picad_tpu.config import LossConfig
from picad_tpu.train.optimizer import make_optimizer
from picad_tpu.train.state import create_train_state
from picad_tpu.train.step import make_train_step
from picad_tpu.utils.logging import MetricLogger


class TinyNet(nn.Module):
    """CapsNet call signature; enough model to produce real gradients."""

    num_classes: int = 24

    @nn.compact
    def __call__(self, img, classification, concat_labels, epoch,
                 thresh_epoch, train=False):
        y = nn.Conv(8, (1, 3, 3), padding="SAME")(img)
        y = jax.nn.relu(y)
        seg = nn.Conv(1, (1, 3, 3), padding="SAME")(y)[..., 0]
        scores = jnp.mean(y, axis=(1, 2, 3)) @ self.param(
            "wcls", nn.initializers.normal(0.1), (8, self.num_classes)
        )
        return seg, scores, None


def _batch(bs=2, hw=32):
    rng = np.random.default_rng(0)
    return {
        "data": rng.integers(0, 256, (bs, 8, hw, hw, 3), dtype=np.uint8),
        "loc_msk": (rng.random((bs, 8, hw, hw, 1)) > 0.7).astype(np.uint8),
        "action": np.zeros((bs,), np.int32),
        "label_vid": np.ones((bs,), np.int32),
        "row_mask": np.ones((bs,), np.float32),
    }


def test_grad_metrics_adds_finite_grad_norm():
    model = TinyNet()
    opt = make_optimizer(1e-4)
    state = create_train_state(
        model, opt, rng=jax.random.PRNGKey(0),
        sample_input_shape=(1, 8, 32, 32, 3),
    )
    step = jax.jit(make_train_step(
        model, opt, LossConfig(bv=True, n_frames=3), grad_metrics=True
    ))
    _, metrics = step(
        state, _batch(), jnp.asarray(1.0), jnp.asarray(0.5)
    )
    gn = float(metrics["grad_norm"])
    assert np.isfinite(gn) and gn > 0.0

    # default build: no grad_norm key, so the production program (and its
    # persistent-cache entry) is byte-identical to before the flag existed
    plain = jax.jit(make_train_step(
        model, opt, LossConfig(bv=True, n_frames=3)
    ))
    _, m2 = plain(state, _batch(), jnp.asarray(1.0), jnp.asarray(0.5))
    assert "grad_norm" not in m2


def test_watch_params_logs_per_leaf_norms(tmp_path):
    model = TinyNet()
    opt = make_optimizer(1e-4)
    state = create_train_state(
        model, opt, rng=jax.random.PRNGKey(0),
        sample_input_shape=(1, 8, 32, 32, 3),
    )
    logger = MetricLogger(str(tmp_path))
    logger.watch_params(jax.device_get(state.params), step=7)
    logger.close()
    path = os.path.join(str(tmp_path), "metrics.jsonl")
    recs = [json.loads(l) for l in open(path)]
    watch = [r for r in recs if r["tag"] == "params_norms"]
    assert len(watch) == 1 and watch[0]["step"] == 7
    leaf_keys = [k for k in watch[0] if k.startswith("params/")]
    # one entry per param leaf (2 convs x kernel+bias, + wcls)
    assert len(leaf_keys) == 5
    assert all(np.isfinite(watch[0][k]) for k in leaf_keys)

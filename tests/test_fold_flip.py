"""Folded (bn_groups=2) vs two-forward train step: exact equivalence.

The fold is a pure dispatch optimization; with dropout disabled (the only
stochastic difference — rng stream assignment), losses, gradients, and BN
running stats must match to float tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from picad_tpu.config import LossConfig
from picad_tpu.models.capsules import CapsNet
from picad_tpu.train.optimizer import make_optimizer
from picad_tpu.train.state import create_train_state
from picad_tpu.train.step import make_train_step


@pytest.mark.heavy
def test_fold_flip_matches_two_forwards(require_accelerator):
    H = 80
    B = 4
    opt = make_optimizer(1e-4)
    cfg = LossConfig(bv=True, n_frames=5, wt_cons=0.1)

    rng = np.random.default_rng(3)
    batch = {
        "data": rng.random((B, 8, H, H, 3)).astype(np.float32),
        "aug_data": rng.random((B, 8, H, H, 3)).astype(np.float32),
        "loc_msk": (rng.random((B, 8, H, H, 1)) > 0.7).astype(np.float32),
        "action": rng.integers(0, 24, (B,)).astype(np.int32),
        "label_vid": (np.arange(B) % 2).astype(np.int32),
    }
    # epoch below thresh_epoch: unlabeled rows use all-ones class masks, so
    # no discrete pseudo-label argmax can flip between the two paths.  (The
    # EM routing's cost_std quirk — ~sqrt(eps) denominators — amplifies
    # reduction-order noise enough that an argmax flip above the threshold
    # produces legitimately different, equally-valid trajectories.)
    e = jnp.asarray(5.0, jnp.float32)
    r = jnp.asarray(0.5, jnp.float32)

    results = {}
    for fold in (False, True):
        model = CapsNet(
            num_classes=24, dropout_rate=0.0, bn_groups=2 if fold else 1
        )
        state = create_train_state(
            model, opt, rng=jax.random.PRNGKey(0),
            sample_input_shape=(2, 8, H, H, 3),
        )
        step = jax.jit(make_train_step(model, opt, cfg, fold_flip=fold))
        new_state, metrics = step(state, batch, e, r)
        results[fold] = (
            {k: float(v) for k, v in metrics.items()},
            jax.device_get(new_state.batch_stats),
            jax.device_get(new_state.params["conv_caps"]["beta_a"]),
        )

    m0, bs0, p0 = results[False]
    m1, bs1, p1 = results[True]
    # The fold is mathematically exact (grouped BN is bitwise identical —
    # see test_batchnorm-style isolation), but batch-16 vs batch-8 convs
    # reduce in different orders; that f32 noise (~4e-4 on seg logits at
    # highest precision) is amplified by the EM routing's ~sqrt(eps)
    # cost_std denominators, so metric-level agreement is ~1e-2 relative.
    # loss_cls is the most amplified: all class scores sit near 0.5 (the
    # 1e-6 routing lambda), so SpreadLoss margins magnify ~1e-3 score noise.
    for k in m0:
        assert m0[k] == pytest.approx(m1[k], rel=2.5e-2, abs=1e-4), (k, m0[k], m1[k])
    leaves0 = jax.tree.leaves(bs0)
    leaves1 = jax.tree.leaves(bs1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(p0, p1, rtol=5e-3, atol=1e-5)

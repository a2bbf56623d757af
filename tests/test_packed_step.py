"""Full train step: packed uint8 prep vs the f32 pixel prep.

The stem-level exactness lives in test_packed_prep.py; this drives the
WHOLE jitted semi-supervised step (fold_flip, bv masks, grads, Adam)
through both prep paths on one uint8 batch and compares losses, BN
stats and a parameter leaf.  Differences are pure f32 reassociation
(conv(x, w/255) vs conv(x/255, w) plus different fusion orders),
amplified by the EM routing's ~sqrt(eps) cost_std quirk exactly like
the fold/two-forward comparison (tests/test_fold_flip.py tolerances).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from picad_tpu.config import LossConfig
from picad_tpu.models.capsules import CapsNet
from picad_tpu.train import step as step_mod
from picad_tpu.train.optimizer import make_optimizer
from picad_tpu.train.state import create_train_state
from picad_tpu.train.step import make_train_step


@pytest.mark.heavy
def test_packed_step_matches_f32_prep(monkeypatch):
    H = 80
    B = 4
    opt = make_optimizer(1e-4)
    cfg = LossConfig(bv=True, n_frames=5, wt_cons=0.1)

    rng = np.random.default_rng(11)
    batch = {
        "data": rng.integers(0, 256, (B, 8, H, H, 3), dtype=np.uint8),
        "loc_msk": (rng.random((B, 8, H, H, 1)) > 0.7).astype(np.uint8),
        "action": rng.integers(0, 24, (B,)).astype(np.int32),
        "label_vid": (np.arange(B) % 2).astype(np.int32),
    }
    # epoch below thresh_epoch — see test_fold_flip.py for why (argmax
    # pseudo-label flips would make trajectories legitimately diverge).
    e = jnp.asarray(5.0, jnp.float32)
    r = jnp.asarray(0.5, jnp.float32)

    results = {}
    for packed in (False, True):
        monkeypatch.setattr(step_mod, "_PACKED_PREP", packed)
        model = CapsNet(num_classes=24, dropout_rate=0.0, bn_groups=2)
        state = create_train_state(
            model, opt, rng=jax.random.PRNGKey(0),
            sample_input_shape=(2, 8, H, H, 3),
        )
        step = jax.jit(make_train_step(model, opt, cfg, fold_flip=True))
        new_state, metrics = step(state, batch, e, r)
        results[packed] = (
            {k: float(v) for k, v in metrics.items()},
            jax.device_get(new_state.batch_stats),
            jax.device_get(new_state.params["conv_caps"]["beta_a"]),
        )

    m0, bs0, p0 = results[False]
    m1, bs1, p1 = results[True]
    for k in m0:
        # loss_cls gets a wider gate: unlike the fold/two-forward compare
        # (identical input bits), the packed path's conv(x, w/255) vs
        # conv(x/255, w) perturbs every activation by ~1 ulp f32, and the
        # EM routing's ~sqrt(eps) cost_std denominators + the 1e-6 routing
        # lambda (class scores within ~1e-3 of 0.5) amplify that to
        # percent-level SpreadLoss deltas (measured 3.3e-2 rel on CPU).
        # The pixel-identity of the two paths is pinned exactly by
        # test_packed_prep.py::test_flip_commutes_with_pack_exactly.
        rel = 7.5e-2 if k == "loss_cls" else 2.5e-2
        assert m0[k] == pytest.approx(m1[k], rel=rel, abs=1e-4), (k, m0[k], m1[k])
    for a, b in zip(jax.tree.leaves(bs0), jax.tree.leaves(bs1)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(p0, p1, rtol=5e-3, atol=1e-5)

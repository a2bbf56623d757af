"""torch->flax converter coverage + retention policy behavior."""

import numpy as np
import pytest

from picad_tpu.checkpoint.torch_convert import (
    convert_capsnet_state_dict,
    convert_i3d_backbone,
)


def _fake_unit3d(sd, prefix, cin, cout, k):
    rng = np.random.default_rng(abs(hash(prefix)) % 2**32)
    sd[f"{prefix}.conv3d.weight"] = rng.standard_normal(
        (cout, cin, *k)
    ).astype(np.float32)
    sd[f"{prefix}.bn.weight"] = rng.standard_normal(cout).astype(np.float32)
    sd[f"{prefix}.bn.bias"] = rng.standard_normal(cout).astype(np.float32)
    sd[f"{prefix}.bn.running_mean"] = rng.standard_normal(cout).astype(np.float32)
    sd[f"{prefix}.bn.running_var"] = rng.uniform(0.5, 2, cout).astype(np.float32)


_MIXED_SPECS = {
    "Mixed_3b": (192, [64, 96, 128, 16, 32, 32]),
    "Mixed_3c": (256, [128, 128, 192, 32, 96, 64]),
    "Mixed_4b": (480, [192, 96, 208, 16, 48, 64]),
    "Mixed_4c": (512, [160, 112, 224, 24, 64, 64]),
    "Mixed_4d": (512, [128, 128, 256, 24, 64, 64]),
    "Mixed_4e": (512, [112, 144, 288, 32, 64, 64]),
    "Mixed_4f": (528, [256, 160, 320, 32, 128, 128]),
}


def _fake_i3d_state_dict(prefix=""):
    sd = {}
    _fake_unit3d(sd, f"{prefix}Conv3d_1a_7x7", 3, 64, (7, 7, 7))
    _fake_unit3d(sd, f"{prefix}Conv3d_2b_1x1", 64, 64, (1, 1, 1))
    _fake_unit3d(sd, f"{prefix}Conv3d_2c_3x3", 64, 192, (3, 3, 3))
    for name, (cin, oc) in _MIXED_SPECS.items():
        _fake_unit3d(sd, f"{prefix}{name}.b0", cin, oc[0], (1, 1, 1))
        _fake_unit3d(sd, f"{prefix}{name}.b1a", cin, oc[1], (1, 1, 1))
        _fake_unit3d(sd, f"{prefix}{name}.b1b", oc[1], oc[2], (3, 3, 3))
        _fake_unit3d(sd, f"{prefix}{name}.b2a", cin, oc[3], (1, 1, 1))
        _fake_unit3d(sd, f"{prefix}{name}.b2b", oc[3], oc[4], (3, 3, 3))
        _fake_unit3d(sd, f"{prefix}{name}.b3b", cin, oc[5], (1, 1, 1))
    return sd


def test_convert_i3d_backbone_counts_and_layout():
    sd = _fake_i3d_state_dict()
    params, stats, n = convert_i3d_backbone(sd)
    # 3 stem Unit3Ds + 7 mixed * 6 branches = 45 Unit3Ds, 5 tensors each
    assert n == 45 * 5
    k = params["conv1"]["Conv3d_1a_7x7"]["kernel"]
    assert k.shape == (7, 7, 7, 3, 64)
    np.testing.assert_array_equal(
        k, np.transpose(sd["Conv3d_1a_7x7.conv3d.weight"], (2, 3, 4, 1, 0))
    )
    assert stats["conv1"]["Mixed_4f"]["b1b"]["bn"]["var"].shape == (320,)


def test_convert_full_capsnet_state_dict():
    rng = np.random.default_rng(0)
    sd = _fake_i3d_state_dict(prefix="conv1.")
    P = 4
    sd["primary_caps.pose.weight"] = rng.standard_normal((512, 832, 9, 9)).astype(
        np.float32
    )
    sd["primary_caps.pose.bias"] = rng.standard_normal(512).astype(np.float32)
    sd["primary_caps.a.weight"] = rng.standard_normal((32, 832, 9, 9)).astype(
        np.float32
    )
    sd["primary_caps.a.bias"] = rng.standard_normal(32).astype(np.float32)
    sd["conv_caps.beta_u"] = rng.standard_normal((24, 16)).astype(np.float32)
    sd["conv_caps.beta_a"] = rng.standard_normal(24).astype(np.float32)
    sd["conv_caps.weights"] = rng.standard_normal((1, 32, 24, P, P)).astype(
        np.float32
    )
    for name, (ci, co, k) in {
        "upsample1": (384, 64, (9, 9)),
        "upsample2": (128, 64, (3, 3, 3)),
        "upsample3": (128, 64, (3, 3, 3)),
        "upsample4": (128, 128, (3, 3, 3)),
        "smooth": (128, 1, (3, 3, 3)),
    }.items():
        sd[f"{name}.weight"] = rng.standard_normal((ci, co, *k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(co).astype(np.float32)
    for name, (co, ci, k) in {
        "conv28": (64, 832, (3, 3)),
        "conv56": (64, 192, (3, 3, 3)),
        "conv112": (64, 64, (3, 3, 3)),
    }.items():
        sd[f"{name}.weight"] = rng.standard_normal((co, ci, *k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(co).astype(np.float32)

    params, stats, n = convert_capsnet_state_dict(sd)
    assert n == 45 * 5 + 4 + 3 + 16
    assert params["primary_caps"]["pose_kernel"].shape == (9, 9, 832, 512)
    assert params["conv_caps"]["weights"].shape == (32, 24, 4, 4)
    assert params["upsample1_kernel"].shape == (9, 9, 384, 64)
    assert params["smooth_kernel"].shape == (3, 3, 3, 128, 1)
    assert params["conv28_kernel"].shape == (3, 3, 832, 64)


def test_converted_weights_load_into_model():
    """Converted tensors overlay cleanly onto initialized variables.

    Param shapes are H/W independent, so an 80x80 init covers the 224 case.
    """
    import jax
    import jax.numpy as jnp

    from picad_tpu.checkpoint.torch_convert import merge_into_variables
    from picad_tpu.models.capsules import CapsNet

    sd = _fake_i3d_state_dict(prefix="conv1.")
    params, stats, n = convert_capsnet_state_dict(sd)

    m = CapsNet(num_classes=24)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 8, 80, 80, 3), jnp.float32)
    # eval_shape: full variable structure without compiling the model
    shapes = jax.eval_shape(
        lambda: m.init(
            {"params": rng, "dropout": rng},
            img,
            jnp.zeros((1,), jnp.int32),
            jnp.ones((1,), jnp.float32),
            0,
            0,
            False,
        )
    )
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    merged = merge_into_variables(variables, params, stats)
    got = merged["params"]["conv1"]["Conv3d_1a_7x7"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(got),
        np.transpose(sd["conv1.Conv3d_1a_7x7.conv3d.weight"], (2, 3, 4, 1, 0)),
    )


def _tiny_state():
    import jax

    from picad_tpu.train.optimizer import make_optimizer
    from picad_tpu.train.state import create_train_state

    class TinyModel:
        def init(self, rngs, *a):
            return {"params": {"w": np.zeros((3,), np.float32)}}

    return create_train_state(
        TinyModel(), make_optimizer(1e-4), rng=jax.random.PRNGKey(0)
    )


def test_resume_mid_plateau_lr_drops_at_same_epoch(tmp_path):
    """Checkpoints carry the ReduceLROnPlateau counters: a run resumed
    mid-plateau reduces the LR at the SAME epoch as an unbroken run.
    (Without the mirrored sched_* state a fresh scheduler restarts the
    patience window — here that would delay the drop to epoch 7.)"""
    import jax

    from picad_tpu.checkpoint.manager import CheckpointIO
    from picad_tpu.train.optimizer import ReduceLROnPlateau

    losses = {1: 1.0, 2: 0.9, 3: 0.9, 4: 0.9, 5: 0.9, 6: 0.9}

    def run_epoch(state, sched, e):
        # mirrors Trainer.fit's scheduler/save ordering
        lr = sched.step(losses[e])
        if abs(lr - state.learning_rate()) > 1e-6 * lr:
            state = state.with_learning_rate(lr)
        return state.replace(
            epoch=jax.numpy.asarray(e, jax.numpy.int32)
        ).with_scheduler(sched), lr

    # unbroken run: patience=2 -> 3rd consecutive bad epoch = epoch 5
    sched = ReduceLROnPlateau(1e-4, patience=2, factor=0.1)
    state = _tiny_state()
    unbroken_lrs = {}
    for e in range(1, 7):
        state, unbroken_lrs[e] = run_epoch(state, sched, e)
    assert unbroken_lrs[4] == 1e-4 and unbroken_lrs[5] == 1e-5

    # interrupted run: checkpoint mid-plateau at epoch 3 (bad=1)
    io = CheckpointIO()
    sched = ReduceLROnPlateau(1e-4, patience=2, factor=0.1)
    state = _tiny_state()
    for e in range(1, 4):
        state, _ = run_epoch(state, sched, e)
    assert sched.num_bad_epochs == 1
    ckpt = str(tmp_path / "ckpt_e3")
    io.save(ckpt, jax.device_get(state))

    # resume into FRESH objects (what Trainer.restore does)
    restored = io.restore(ckpt, jax.device_get(_tiny_state()))
    sched2 = ReduceLROnPlateau(1e-4, patience=2, factor=0.1)
    restored.load_scheduler(sched2)
    # best rides in the state as f32 (real losses are f32 off-device
    # anyway; only this test's f64 literal sees the rounding)
    assert sched2.best == pytest.approx(0.9) and sched2.num_bad_epochs == 1
    resumed_lrs = {}
    state2 = restored
    for e in range(int(restored.epoch) + 1, 7):
        state2, resumed_lrs[e] = run_epoch(state2, sched2, e)
    # (the restored LR round-trips through f32 in opt_state, hence approx)
    assert resumed_lrs[4] == pytest.approx(1e-4)  # no premature drop
    assert resumed_lrs[5] == pytest.approx(1e-5)  # same drop epoch
    assert unbroken_lrs[5] == 1e-5
    assert resumed_lrs[6] == pytest.approx(unbroken_lrs[6])


def test_best_checkpoint_policy(tmp_path):
    from picad_tpu.checkpoint.manager import BestCheckpointPolicy

    saved = []

    class FakeIO:
        def save(self, path, state):
            import os

            os.makedirs(path, exist_ok=True)
            saved.append(path)

    p = BestCheckpointPolicy(str(tmp_path), "train", keep_all_after_epoch=20)
    p.io = FakeIO()
    assert p.maybe_save(1, 5.0, {}) is not None
    assert p.maybe_save(2, 6.0, {}) is None  # not an improvement
    assert p.maybe_save(3, 4.0, {}) is not None
    import os

    # epoch 3 < 20 -> epoch-1 checkpoint deleted
    assert not os.path.exists(saved[0])
    assert os.path.exists(saved[1])

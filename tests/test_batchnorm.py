"""TorchBatchNorm vs nn.BatchNorm3d(eps=1e-3, momentum=0.01) on CPU."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

import pytest

from picad_tpu.models import layers as _layers
from picad_tpu.models.layers import TorchBatchNorm

RNG = np.random.default_rng(1)


@pytest.fixture(autouse=True)
def _onepass_on_tiny_shapes(monkeypatch):
    """Exercise the one-pass stats path even on CPU-size tensors
    (production gates it on tensor size, layers._BN_ONEPASS_MIN)."""
    monkeypatch.setattr(_layers, "_BN_ONEPASS_MIN", 0)


def _run_torch(x_steps, training):
    bn = torch.nn.BatchNorm3d(x_steps[0].shape[1], eps=1e-3, momentum=0.01)
    bn.weight.data = torch.from_numpy(
        RNG.standard_normal(x_steps[0].shape[1]).astype(np.float32)
    )
    bn.bias.data = torch.from_numpy(
        RNG.standard_normal(x_steps[0].shape[1]).astype(np.float32)
    )
    bn.train(training)
    outs = [bn(torch.from_numpy(x)).detach().numpy() for x in x_steps]
    return bn, outs


def test_batchnorm_train_and_eval_match_torch():
    c = 6
    x_steps = [RNG.standard_normal((2, c, 3, 4, 4)).astype(np.float32) for _ in range(3)]
    bn_t, outs_t = _run_torch(x_steps, training=True)

    mod = TorchBatchNorm()
    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 1, 1, c)), False)
    params = {
        "scale": jnp.asarray(bn_t.weight.detach().numpy()),
        "bias": jnp.asarray(bn_t.bias.detach().numpy()),
    }
    stats = variables["batch_stats"]

    for x, ref in zip(x_steps, outs_t):
        xj = jnp.asarray(np.moveaxis(x, 1, -1))
        out, mut = mod.apply(
            {"params": params, "batch_stats": stats},
            xj,
            False,
            mutable=["batch_stats"],
        )
        stats = mut["batch_stats"]
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(out), -1, 1), ref, rtol=1e-4, atol=1e-4
        )

    # Running stats after 3 train steps must match torch's.
    np.testing.assert_allclose(
        np.asarray(stats["mean"]), bn_t.running_mean.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]), bn_t.running_var.numpy(), rtol=1e-4, atol=1e-5
    )

    # Eval mode uses the running stats.
    bn_t.eval()
    x = x_steps[0]
    ref_eval = bn_t(torch.from_numpy(x)).detach().numpy()
    out_eval = mod.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.moveaxis(x, 1, -1)),
        True,
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out_eval), -1, 1), ref_eval, rtol=1e-4, atol=1e-4
    )


def test_batchnorm_onepass_cancellation_stress():
    """The shifted one-pass stats must survive |mean| >> std channels.

    The textbook one-pass var = E[x^2] - E[x]^2 loses ~ (mean/std)^2
    relative accuracy to f32 cancellation (this input: amplification
    ~1e6, i.e. garbage); the shifted form used by default
    (layers._BN_ONEPASS) must match a float64 oracle at golden
    tolerances.  This is the regression test for the train-parity
    failure that killed the raw one-pass form on hardware.
    """
    c = 8
    base = RNG.standard_normal((1, 1, 1, 1, c)).astype(np.float32) * 100.0
    x = base + 0.1 * RNG.standard_normal((4, 3, 16, 16, c)).astype(np.float32)

    mod = TorchBatchNorm()
    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 1, 1, c)), False)
    out, mut = mod.apply(variables, jnp.asarray(x), False, mutable=["batch_stats"])

    x64 = x.astype(np.float64).reshape(-1, c)
    mean64 = x64.mean(axis=0)
    var64 = x64.var(axis=0)  # biased, matching batch normalization
    ref = (x.astype(np.float64) - mean64) / np.sqrt(var64 + 1e-3)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)

    n = x64.shape[0]
    ref_var_running = 1.0 * 0.99 + 0.01 * var64 * n / (n - 1)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]), ref_var_running, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]), 0.01 * mean64, rtol=1e-4
    )


def test_batchnorm_onepass_matches_twopass_grads():
    """Shifted one-pass and two-pass BN agree on value AND gradient."""
    from picad_tpu.models import layers as L

    c = 5
    x = RNG.standard_normal((2, 2, 6, 6, c)).astype(np.float32) + 3.0

    mod = TorchBatchNorm()
    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 1, 1, c)), False)

    def loss(xj):
        out, _ = mod.apply(variables, xj, False, mutable=["batch_stats"])
        return jnp.sum(out * out)

    saved = L._BN_ONEPASS
    try:
        L._BN_ONEPASS = True
        v1, g1 = jax.value_and_grad(loss)(jnp.asarray(x))
        L._BN_ONEPASS = False
        v2, g2 = jax.value_and_grad(loss)(jnp.asarray(x))
    finally:
        L._BN_ONEPASS = saved
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_batchnorm_stats_groups2_onepass_matches_two_torch_forwards():
    """stats_groups=2 on the ONE-PASS path (the production fold_flip
    config: bn_groups=2 + PICAD_BN_ONEPASS=1, which no other test
    combined before) == two sequential torch forwards: group g of the
    folded batch normalizes with its own batch stats, and the running
    stats see two sequential EMA updates."""
    c = 6
    halves = [
        (RNG.standard_normal((2, c, 3, 8, 8)).astype(np.float32)
         + 5.0 * RNG.standard_normal((1, c, 1, 1, 1)).astype(np.float32))
        for _ in range(2)
    ]
    bn_t, (o1, o2) = _run_torch(halves, training=True)

    mod = TorchBatchNorm(stats_groups=2)
    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((2, 1, 1, 1, c)), False)
    params = {
        "scale": jnp.asarray(bn_t.weight.detach().numpy()),
        "bias": jnp.asarray(bn_t.bias.detach().numpy()),
    }
    folded = jnp.concatenate(
        [jnp.asarray(np.moveaxis(h, 1, -1)) for h in halves], axis=0
    )
    out, mut = mod.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        folded, False, mutable=["batch_stats"],
    )
    got = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(got[:2], o1, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[2:], o2, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]), bn_t.running_mean.numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]), bn_t.running_var.numpy(),
        rtol=1e-4, atol=1e-5,
    )

    # and the G=2 one-pass gradient matches the two-pass form
    from picad_tpu.models import layers as L

    def loss(xj):
        o, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xj, False, mutable=["batch_stats"],
        )
        return jnp.sum(o * o)

    saved = L._BN_ONEPASS
    try:
        L._BN_ONEPASS = True
        v1, g1 = jax.value_and_grad(loss)(folded)
        L._BN_ONEPASS = False
        v2, g2 = jax.value_and_grad(loss)(folded)
    finally:
        L._BN_ONEPASS = saved
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_batchnorm_lanefold_matches_default():
    """Lane-folded stat reduction (staged PICAD_BN_LANEFOLD) is exact.

    Folding rows into the lane dim reorders the per-channel sums only
    (reassociation); values, running stats and gradients must match the
    unfolded one-pass path at f32 roundoff.
    """
    from picad_tpu.models import layers as L

    c = 4  # k = 128 // 4 = 32 folds
    x = RNG.standard_normal((2, 2, 8, 8, c)).astype(np.float32) + 2.0

    mod = TorchBatchNorm()
    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 1, 1, c)), False)

    def run(xj):
        out, mut = mod.apply(variables, xj, False, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    def loss(xj):
        return jnp.sum(jnp.square(run(xj)[0]))

    saved = L._BN_LANEFOLD
    try:
        L._BN_LANEFOLD = False
        out0, stats0 = run(jnp.asarray(x))
        g0 = jax.grad(loss)(jnp.asarray(x))
        L._BN_LANEFOLD = True
        out1, stats1 = run(jnp.asarray(x))
        g1 = jax.grad(loss)(jnp.asarray(x))
    finally:
        L._BN_LANEFOLD = saved
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(stats1[k]), np.asarray(stats0[k]), rtol=1e-6
        )
    # grads have near-zero elements where reassociation shows up as
    # relative noise; the absolute scale is what matters
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-3, atol=1e-5)

"""Pallas BN-stats kernel (ops/bn_stats.py) vs the two-pass oracle.

Values, gradients, the cancellation-stress input that killed the
textbook one-pass form, and the TorchBatchNorm wiring at the production
fold_flip config (stats_groups=2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from picad_tpu.ops import bn_stats

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernel"
)

RNG = np.random.default_rng(7)


def _oracle(x, groups):
    c = x.shape[-1]
    xg = np.asarray(x, np.float64).reshape(groups, -1, c)
    return xg.mean(axis=1), xg.var(axis=1)  # biased


@pytest.mark.parametrize("groups", [1, 2])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_group_stats_values(groups, dtype):
    x = jnp.asarray(
        RNG.standard_normal((4, 3, 16, 16, 8)) * 2.0 + 1.5, dtype
    )
    assert bn_stats._pick_tile(x.size // (groups * 8), 8) is not None
    mean, var = bn_stats.group_stats(x, groups)
    m64, v64 = _oracle(x, groups)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5  # bf16 input rounding
    np.testing.assert_allclose(np.asarray(mean), m64, rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(var), v64, rtol=tol, atol=tol)


def test_group_stats_cancellation_stress():
    """|mean| >> std channels: the regression shape for the textbook
    one-pass failure (README, one-pass lever history).  f32 input so
    the comparison isolates ACCUMULATION error, not input rounding."""
    c = 8
    base = RNG.standard_normal((1, 1, 1, 1, c)).astype(np.float32) * 100.0
    x = jnp.asarray(
        base + 0.1 * RNG.standard_normal((4, 4, 32, 32, c)).astype(np.float32)
    )
    mean, var = bn_stats.group_stats(x, 2)
    m64, v64 = _oracle(x, 2)
    np.testing.assert_allclose(np.asarray(mean), m64, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), v64, rtol=2e-4)


def test_group_stats_gradients_match_twopass():
    x = jnp.asarray(
        RNG.standard_normal((4, 2, 16, 16, 8)).astype(np.float32) + 3.0
    )

    def loss_pallas(xj):
        mean, var = bn_stats.group_stats(xj, 2)
        return jnp.sum(mean * var) + jnp.sum(jnp.square(mean))

    def loss_ref(xj):
        xg = xj.reshape(2, -1, 8)
        mean = jnp.mean(xg, axis=1)
        var = jnp.mean(jnp.square(xg - mean[:, None, :]), axis=1)
        return jnp.sum(mean * var) + jnp.sum(jnp.square(mean))

    v1, g1 = jax.value_and_grad(loss_pallas)(x)
    v2, g2 = jax.value_and_grad(loss_ref)(x)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-6)


def test_batchnorm_dispatches_pallas_stats(monkeypatch):
    """TorchBatchNorm at stats_groups=2 routes big tensors through the
    kernel and matches the two-pass path (values + running stats)."""
    from picad_tpu.models import layers as L
    from picad_tpu.models.layers import TorchBatchNorm

    c = 8
    x = jnp.asarray(
        RNG.standard_normal((4, 2, 16, 16, c)).astype(np.float32) + 2.0
    )
    mod = TorchBatchNorm(stats_groups=2)
    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((2, 1, 1, 1, c)), False)

    def run():
        out, mut = mod.apply(variables, x, False, mutable=["batch_stats"])
        return np.asarray(out), jax.tree_util.tree_map(
            np.asarray, mut["batch_stats"]
        )

    monkeypatch.setattr(L, "_BN_ONEPASS_MIN", 0)
    monkeypatch.setattr(bn_stats, "_ENABLED", True)
    assert bn_stats.pallas_stats_active(x.shape, 2, x.dtype)
    out_k, stats_k = run()
    monkeypatch.setattr(bn_stats, "_ENABLED", False)
    monkeypatch.setattr(L, "_BN_ONEPASS", False)
    out_r, stats_r = run()
    np.testing.assert_allclose(out_k, out_r, rtol=1e-4, atol=1e-4)
    for k in ("mean", "var"):
        np.testing.assert_allclose(stats_k[k], stats_r[k], rtol=1e-4)


def test_gate_rejects_undividable_shapes():
    saved = bn_stats._ENABLED
    bn_stats._ENABLED = True
    try:
        if jax.default_backend() == "tpu":
            # n = 3*5*7 = 105 rows/group: no power-of-2 tile divides it
            assert not bn_stats.pallas_stats_active((2, 3, 5, 7, 8), 2,
                                                    jnp.float32)
            # odd channel count
            assert not bn_stats.pallas_stats_active((4, 2, 16, 16, 6), 2,
                                                    jnp.float32)
            # batch not divisible by groups
            assert not bn_stats.pallas_stats_active((3, 2, 16, 16, 8), 2,
                                                    jnp.float32)
    finally:
        bn_stats._ENABLED = saved

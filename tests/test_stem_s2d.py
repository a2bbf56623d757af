"""Space-to-depth stem == naive 7^3/s2 SAME conv (same params)."""

import numpy as np

import jax
import jax.numpy as jnp

from picad_tpu.models.i3d import StemS2D
from picad_tpu.models.layers import Unit3D


def test_stem_s2d_matches_naive_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 32, 3)).astype(np.float32))

    naive = Unit3D(64, (7, 7, 7), (2, 2, 2))
    v = naive.init(jax.random.PRNGKey(0), x, False)
    y_ref = naive.apply(v, x, False)

    s2d = StemS2D(64)
    v2 = s2d.init(jax.random.PRNGKey(1), x, False)
    # share the same kernel + bn params
    v2 = {"params": v["params"], "batch_stats": v["batch_stats"]}
    y = s2d.apply(v2, x, False)

    assert y.shape == y_ref.shape == (2, 4, 16, 16, 64)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)


def test_stem_s2d_train_mode_matches():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16, 3)).astype(np.float32))
    naive = Unit3D(64, (7, 7, 7), (2, 2, 2))
    v = naive.init(jax.random.PRNGKey(0), x, False)
    y_ref, mut_ref = naive.apply(v, x, True, mutable=["batch_stats"])
    s2d = StemS2D(64)
    y, mut = s2d.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"]},
        x,
        True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["bn"]["mean"]),
        np.asarray(mut_ref["batch_stats"]["bn"]["mean"]),
        rtol=1e-4,
        atol=1e-5,
    )

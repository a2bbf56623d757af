"""Packed uint8 input prep (train/step.py PICAD_PACKED_PREP).

The packed path reorders input prep — space-to-depth in uint8, the
horizontal flip as a W-reverse + wp-phase channel swap, /255 folded
into the stem kernel — so the expensive ops stop running on C=3-minor
layouts (3/128 vector lanes).  These tests pin its exactness:

1. integer-level: pack(flip(x)) == flip_packed(pack(x)) for uint8
   (the flip/S2D commutation is exact, no arithmetic involved);
2. stem-level at f32: StemS2D(packed uint8) vs StemS2D(f32 pixels/255)
   agree to f32 roundoff (conv(x, w/255) == conv(x/255, w); the BN that
   follows absorbs the affine reordering);
3. prepare_views wiring: the packed branch triggers exactly on the
   uint8 device layout and returns views the unpacked branch matches
   after manual unpacking.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from picad_tpu.models.i3d import StemS2D
from picad_tpu.train import step as step_mod

RNG = np.random.default_rng(7)


def _pack_np(x):
    B, T, H, W, C = x.shape
    xp = x.reshape(B, T // 2, 2, H // 2, 2, W // 2, 2, C)
    xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return xp.reshape(B, T // 2, H // 2, W // 2, 8 * C)


def test_flip_commutes_with_pack_exactly():
    x = RNG.integers(0, 256, (2, 8, 16, 12, 3), dtype=np.uint8)
    flipped_then_packed = _pack_np(x[:, :, :, ::-1, :])
    packed_then_flipped = np.asarray(
        step_mod.flip_packed_w(jnp.asarray(_pack_np(x)))
    )
    np.testing.assert_array_equal(flipped_then_packed, packed_then_flipped)


def test_stem_packed_matches_normalized_f32():
    x = RNG.integers(0, 256, (2, 8, 16, 16, 3), dtype=np.uint8)
    stem = StemS2D(features=8, compute_dtype=jnp.float32)
    variables = stem.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 3), jnp.float32), False
    )

    ref = stem.apply(variables, jnp.asarray(x, jnp.float32) / 255.0, False)
    packed = stem.apply(variables, jnp.asarray(_pack_np(x)), False)
    np.testing.assert_allclose(
        np.asarray(packed), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def test_stem_packed_gradients_match(monkeypatch):
    """Kernel gradients through the packed path equal the f32 path
    (the only learnable consumer of the reordering)."""
    x = RNG.integers(0, 256, (2, 8, 16, 16, 3), dtype=np.uint8)
    stem = StemS2D(features=8, compute_dtype=jnp.float32)
    variables = stem.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 3), jnp.float32), False
    )

    def loss_ref(params):
        out = stem.apply(
            {**variables, "params": params},
            jnp.asarray(x, jnp.float32) / 255.0,
            False,
        )
        return jnp.sum(out * out)

    def loss_packed(params):
        out = stem.apply(
            {**variables, "params": params}, jnp.asarray(_pack_np(x)), False
        )
        return jnp.sum(out * out)

    g_ref = jax.grad(loss_ref)(variables["params"])
    g_pk = jax.grad(loss_packed)(variables["params"])
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_p = jax.tree_util.tree_leaves(g_pk)
    for (path, r), p in zip(flat_r, flat_p):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), rtol=2e-4, atol=1e-5,
            err_msg=str(path),
        )


def test_prepare_views_packed_branch(monkeypatch):
    monkeypatch.setattr(step_mod, "_PACKED_PREP", True)
    data = RNG.integers(0, 256, (2, 8, 16, 16, 3), dtype=np.uint8)
    msk = (RNG.random((2, 8, 16, 16, 1)) > 0.5).astype(np.uint8)
    batch = {"data": jnp.asarray(data), "loc_msk": jnp.asarray(msk)}
    d, a, seg = step_mod.prepare_views(batch)
    assert d.dtype == jnp.uint8 and d.shape == (2, 4, 8, 8, 24)
    np.testing.assert_array_equal(np.asarray(d), _pack_np(data))
    np.testing.assert_array_equal(np.asarray(a), _pack_np(data[:, :, :, ::-1, :]))
    np.testing.assert_allclose(np.asarray(seg), msk[..., 0].astype(np.float32))

    # the reference f32 layout must NOT take the packed branch
    batch_f32 = {
        "data": jnp.asarray(data, jnp.float32) / 255.0,
        "aug_data": jnp.asarray(data[:, :, :, ::-1, :], jnp.float32) / 255.0,
        "loc_msk": jnp.asarray(msk),
    }
    d2, a2, _ = step_mod.prepare_views(batch_f32)
    assert d2.dtype == jnp.float32 and d2.shape == (2, 8, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(d2[:, :, :, ::-1, :]))

"""ConvCaps general-K and class-caps (w_shared/coor_add) modes."""

import numpy as np

import jax
import jax.numpy as jnp

from picad_tpu.models.capsules import ConvCaps


def _input(b, h, w, Bi=4, P=2, seed=0):
    rng = np.random.default_rng(seed)
    c = Bi * (P * P + 1)
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    # activations live in the last Bi channels; squash into (0, 1)
    x[..., Bi * P * P :] = 1 / (1 + np.exp(-x[..., Bi * P * P :]))
    return jnp.asarray(x)


def test_conv_caps_1x1_shapes():
    m = ConvCaps(in_caps=4, out_caps=3, pose_size=2)
    x = _input(2, 5, 5)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 5, 5, 3 * 4 + 3)
    acts = np.asarray(out[..., 12:])
    assert (acts >= 0).all() and (acts <= 1).all()


def test_conv_caps_k3_shapes():
    m = ConvCaps(in_caps=4, out_caps=3, pose_size=2, kernel=(3, 3), stride=(2, 2))
    x = _input(2, 7, 7)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert v["params"]["weights"].shape == (9 * 4, 3, 2, 2)
    assert out.shape == (2, 3, 3, 3 * 4 + 3)


def test_class_caps_w_shared():
    m = ConvCaps(in_caps=4, out_caps=6, pose_size=2, w_shared=True)
    x = _input(2, 3, 3)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 6)  # activations only


def test_class_caps_coord_add_changes_votes():
    kwargs = dict(in_caps=4, out_caps=6, pose_size=2, w_shared=True)
    x = _input(2, 3, 3)
    m1 = ConvCaps(**kwargs)
    v = m1.init(jax.random.PRNGKey(0), x)
    out1 = m1.apply(v, x)
    m2 = ConvCaps(coor_add=True, **kwargs)
    out2 = m2.apply(v, x)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))

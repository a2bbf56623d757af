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


def test_primary_caps_split_vs_merged_equivalent():
    """The PICAD_PCAPS_SPLIT default (two separate pose/act convs) and
    the merged 544-channel A/B counterfactual compute the same math:
    per-output-channel reductions are independent, so concatenating the
    kernels changes nothing mathematically (tools/ab_primarycaps.py
    relies on this to be a pure perf A/B).  Equality is exact on the
    TPU default-precision path; under highest-precision f32 the conv's
    K-reduction tiling differs between Co=544 and Co=512/32, so the two
    forms differ at the float-reassociation level (~7e-7 abs observed),
    hence allclose rather than array_equal."""
    import picad_tpu.models.capsules as capsules
    from picad_tpu.models.capsules import PrimaryCaps

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 11, 11, 24)).astype(np.float32))
    m = PrimaryCaps(caps_types=4, pose_size=2, kernel=3)
    v = m.init(jax.random.PRNGKey(1), x)
    prev = capsules._PCAPS_SPLIT
    try:
        capsules._PCAPS_SPLIT = False
        merged = np.asarray(m.apply(v, x))
        capsules._PCAPS_SPLIT = True
        split = np.asarray(m.apply(v, x))
    finally:
        capsules._PCAPS_SPLIT = prev
    np.testing.assert_allclose(merged, split, rtol=2e-4, atol=2e-6)

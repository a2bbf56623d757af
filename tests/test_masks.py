"""Attentive-mask ops vs per-sample numpy oracles.

The oracles mirror the reference's loops (utils/helpers.py:8-95) —
np.take with the literal 3/5-frame cyclic index tables, half-cycle
folding, double np.gradient — written independently in loop form.
"""

import numpy as np

import jax.numpy as jnp

from picad_tpu.ops.masks import (
    pixelwise_cyclic_variance,
    pixelwise_gradient,
    temporal_gradient,
)

RNG = np.random.default_rng(3)


def _oracle_cyclic_variance(pred, flip_pred, frames_cnt, use_sigmoid):
    B = pred.shape[0]
    out = np.zeros((B, 8, *pred.shape[2:]))
    p, fp = pred, flip_pred
    if use_sigmoid:
        p = 1 / (1 + np.exp(-pred))
        fp = 1 / (1 + np.exp(-flip_pred))
    for z in range(B):
        cyc = np.concatenate([p[z], fp[z][1:7]], axis=0)  # (14, H, W)
        var = np.zeros_like(cyc)
        n = cyc.shape[0]
        for t in range(n):
            if frames_cnt == 3:
                if t + 1 > n - 1:
                    idx = [t - 1, t, 0]
                else:
                    idx = [t - 1, t, t + 1]
            else:
                if t + 1 > n - 1:
                    idx = [t - 2, t - 1, t, 0, 1]
                elif t + 2 > n - 1:
                    idx = [t - 2, t - 1, t, t + 1, 0]
                else:
                    idx = [t - 2, t - 1, t, t + 1, t + 2]
            var[t] = np.var(np.take(cyc, idx, axis=0), axis=0)
        for i in range(8):
            if i == 0 or i == 7:
                var[i] = 2 * var[i]
            else:
                var[i] = var[i] + var[14 - i]
        cv = var[:8]
        cv = cv - cv.min()
        cv = cv / (cv.max() - cv.min() + 1e-7)
        out[z] = cv
    return out


def test_cyclic_variance_matches_oracle():
    for window in (3, 5):
        for use_sig in (False, True):
            pred = RNG.standard_normal((2, 8, 6, 6))
            flip_pred = RNG.standard_normal((2, 8, 6, 6))
            ref = _oracle_cyclic_variance(pred, flip_pred, window, use_sig)
            out = pixelwise_cyclic_variance(
                jnp.asarray(pred, jnp.float32),
                jnp.asarray(flip_pred, jnp.float32),
                window=window,
                use_sigmoid=use_sig,
            )
            np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_temporal_gradient_matches_np():
    x = RNG.standard_normal((3, 8, 4, 4))
    ref = np.gradient(x, axis=1)
    out = temporal_gradient(jnp.asarray(x, jnp.float32), axis=1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_pixelwise_gradient_matches_oracle():
    pred = RNG.standard_normal((2, 8, 5, 5))
    for lo, hi in [(None, None), (0.3, None), (None, 0.8), (0.3, 0.8)]:
        sig = 1 / (1 + np.exp(-pred))
        ref = np.zeros_like(sig)
        for z in range(pred.shape[0]):
            c = sig[z].copy()
            if lo is not None:
                c[c < lo] = 0
            if hi is not None:
                c[c > hi] = 1
            g = np.gradient(np.gradient(c, axis=0), axis=0)
            g = g - g.min()
            g = g / (g.max() - g.min() + 1e-7)
            ref[z] = g
        out = pixelwise_gradient(
            jnp.asarray(pred, jnp.float32),
            conf_thresh_lower=lo,
            conf_thresh_upper=hi,
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_masks_are_normalized():
    pred = RNG.standard_normal((2, 8, 6, 6)).astype(np.float32)
    flip = RNG.standard_normal((2, 8, 6, 6)).astype(np.float32)
    v = np.asarray(pixelwise_cyclic_variance(jnp.asarray(pred), jnp.asarray(flip)))
    g = np.asarray(pixelwise_gradient(jnp.asarray(pred)))
    assert v.min() >= 0 and v.max() <= 1.0 + 1e-6
    assert g.min() >= 0 and g.max() <= 1.0 + 1e-6

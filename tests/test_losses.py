"""Loss numerics vs torch / closed-form oracles."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from picad_tpu.objectives import (
    bce_with_logits,
    dice_loss,
    iou_loss,
    spread_loss,
    weighted_mse_loss,
)
from picad_tpu.objectives.losses import weighted_mse_outer
from picad_tpu.objectives.ramp_ups import exp_rampup, linear_rampup

RNG = np.random.default_rng(4)


def _spread_oracle(x, target, m_min=0.2, m_max=0.9):
    """Loop transcription of losses.py:14-37 incl. the double /b."""
    b, E = x.shape
    margin = m_min + (m_max - m_min) * 0.0
    at = np.array([x[i, t] for i, t in enumerate(target)])[:, None]
    at = np.repeat(at, E, axis=1)
    absl = np.maximum(0.9 - (at - x), 0) ** 2
    loss = np.maximum(margin - (at - x), 0) ** 2
    absl = absl.sum() / b - 0.9**2
    loss = loss.sum() / b - margin**2
    loss = loss / b
    return loss, absl


def test_spread_loss_matches_oracle():
    x = RNG.standard_normal((6, 24)).astype(np.float32)
    t = RNG.integers(0, 24, (6,))
    ref_l, ref_a = _spread_oracle(x.astype(np.float64), t)
    l, a = spread_loss(jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(float(l), ref_l, rtol=1e-5)
    np.testing.assert_allclose(float(a), ref_a, rtol=1e-5)


def test_dice_loss_matches_torch_formula():
    logits = RNG.standard_normal((2, 8, 6, 6)).astype(np.float32)
    targets = (RNG.uniform(size=(2, 8, 6, 6)) > 0.5).astype(np.float32)
    inp = torch.sigmoid(torch.from_numpy(logits)).reshape(-1)
    tgt = torch.from_numpy(targets).reshape(-1)
    inter = (inp * tgt).sum()
    ref = 1 - (2 * inter + 1) / (inp.sum() + tgt.sum() + 1)
    out = dice_loss(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_bce_matches_torch():
    logits = RNG.standard_normal((3, 8, 5, 5)).astype(np.float32) * 3
    targets = (RNG.uniform(size=(3, 8, 5, 5)) > 0.5).astype(np.float32)
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)
    )
    out = bce_with_logits(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_weighted_mse_equal_weights_is_mse():
    a = RNG.standard_normal((2, 8, 4, 4)).astype(np.float32)
    b = RNG.standard_normal((2, 8, 4, 4)).astype(np.float32)
    w = np.ones_like(a)
    ref = torch.nn.functional.mse_loss(torch.from_numpy(a), torch.from_numpy(b))
    out = weighted_mse_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(w))
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_weighted_mse_outer_matches_torch_broadcast():
    """The gv path's (B, B, ...) broadcast (main_ucf101.py:130-132)."""
    B = 3
    inp = RNG.standard_normal((B, 1, 8, 4, 4)).astype(np.float32)
    tgt = RNG.standard_normal((B, 1, 8, 4, 4)).astype(np.float32)
    w = RNG.uniform(size=(B, 8, 4, 4)).astype(np.float32)
    ref = (
        (torch.from_numpy(w) * (torch.from_numpy(inp) - torch.from_numpy(tgt)) ** 2)
        .mean()
        .item()
    )
    out = weighted_mse_outer(jnp.asarray(inp), jnp.asarray(tgt), jnp.asarray(w))
    np.testing.assert_allclose(float(out), ref, rtol=1e-5)


def test_iou_loss_bounds():
    logits = RNG.standard_normal((2, 8, 4, 4)).astype(np.float32)
    targets = (RNG.uniform(size=(2, 8, 4, 4)) > 0.5).astype(np.float32)
    v = float(iou_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert 0.0 <= v <= 1.0


def test_ramp_ups():
    ramp = exp_rampup(11)
    assert ramp(0) == pytest.approx(np.exp(-5.0), rel=1e-6)
    assert ramp(11) == 1.0
    assert ramp(50) == 1.0
    assert ramp(5) == pytest.approx(float(np.exp(-5.0 * (1 - 5 / 11) ** 2)), rel=1e-6)
    lin = linear_rampup(10)
    assert lin(5) == 0.5 and lin(20) == 1.0


def test_weighted_mse_outer_row_mask_equals_smaller_batch():
    """Masked padded batch == the physically smaller batch (ragged final
    training batch, reference DataLoader drop_last=False)."""
    B, real = 4, 3
    inp = RNG.standard_normal((B, 1, 8, 4, 4)).astype(np.float32)
    tgt = RNG.standard_normal((B, 1, 8, 4, 4)).astype(np.float32)
    w = RNG.uniform(size=(B, 8, 4, 4)).astype(np.float32)
    inp[real:] = 0
    tgt[real:] = 0
    w[real:] = 0
    rm = np.zeros((B,), np.float32)
    rm[:real] = 1.0
    masked = weighted_mse_outer(
        jnp.asarray(inp), jnp.asarray(tgt), jnp.asarray(w), row_mask=jnp.asarray(rm)
    )
    small = weighted_mse_outer(
        jnp.asarray(inp[:real]), jnp.asarray(tgt[:real]), jnp.asarray(w[:real])
    )
    np.testing.assert_allclose(float(masked), float(small), rtol=1e-6)

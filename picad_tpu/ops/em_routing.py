"""EM routing between capsule layers, as pure XLA ops.

Numerically matches the reference implementation
(models/capsules_ucf101.py:108-211 — m_step :108-156, e_step :158-182,
caps_em_routing :184-211), including its quirks, which are part of the
trained behaviour and must be preserved:

- the a_out update uses a *normalized cost deviation*
  sigmoid(lambda * (beta_a - (cost_mean - cost) / cost_std)) with
  lambda = 1e-6 (:152), not the paper's formula;
- cost_std is computed as sqrt( (sum_j (cost_j - mean))^2 / C + eps )
  (:144) — the sum over capsule types happens *before* squaring, so the
  value is ~sqrt(eps) up to float error.  We reproduce the formula
  literally rather than "fixing" it;
- eps placement in the r normalizations (:128, :131).

Shapes follow the reference's flattening: the routing problem is batched
over b = B_batch * H * W positions, with Bi input capsules, C output
capsules and psize = P*P pose entries.  All reductions are over the small
Bi/C axes, so XLA maps this onto the VPU as a few fused elementwise
passes; the heavy lift (the vote transform) is a matmul outside this
function.

The number of iterations is a static Python int: the loop is unrolled at
trace time (3 iterations in all reference configs), letting XLA fuse
across iterations.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

_LN_2PI = math.log(2.0 * math.pi)

# PICAD_EM_REMAT=1 wraps the routing loop in jax.checkpoint: the
# backward then recomputes the unrolled EM chain from the vote tensor
# instead of loading each iteration's saved intermediates from HBM —
# a bandwidth/FLOPs trade.  MEASURED NEUTRAL on hardware (interleaved
# 40-step A/Bs, v5e, 2026-08-18: deltas +0.15 / -0.10 ms on a ~76 ms
# step — within run variance), so the default stays the simpler
# store-intermediates path.  Semantically the identity either way.
_REMAT = os.environ.get("PICAD_EM_REMAT", "0") == "1"


def _m_step(a_in, r, v, beta_u, beta_a, eps, lam):
    """One M step.  a_in: (b, Bi, 1); r: (b, Bi, C); v: (b, Bi, C, psize).

    Returns a_out (b, C), mu (b, 1, C, psize), sigma_sq (b, 1, C, psize).
    Mirrors models/capsules_ucf101.py:108-156.

    Mixed precision: the large (b, Bi, C[, psize]) tensors stay in
    v.dtype (bf16 in production — these elementwise passes are the HBM
    bandwidth cost of routing), while the tiny (b, C) cost/activation
    chain runs in f32: the reference's cost_std computes
    sqrt((sum_j(cost_j - mean))^2 / C + eps), whose sum cancels to ~0 by
    construction — a catastrophic-cancellation quirk that low precision
    would distort by orders of magnitude.  With f32 v (the parity/test
    configuration) every operation is identical to the literal form.
    """
    b, Bi, C, psize = v.shape
    f32 = jnp.float32
    r = r * a_in
    r = r / (jnp.sum(r, axis=2, keepdims=True) + jnp.asarray(eps, r.dtype))
    r_sum = jnp.sum(r, axis=1, keepdims=True)  # (b, 1, C)
    coeff = (r / (r_sum + jnp.asarray(eps, r.dtype)))[..., None]  # (b, Bi, C, 1)

    mu = jnp.sum(coeff * v, axis=1, keepdims=True)  # (b, 1, C, psize)
    sigma_sq = jnp.sum(coeff * (v - mu) ** 2, axis=1, keepdims=True) + jnp.asarray(
        eps, v.dtype
    )

    cost_h = (
        beta_u.astype(f32)
        + jnp.log(jnp.sqrt(sigma_sq[:, 0].astype(f32)))
    ) * r_sum.reshape(b, C, 1).astype(f32)  # (b, C, psize)
    cost_h = jnp.sum(cost_h, axis=2)  # (b, C)

    cost_mean = jnp.mean(cost_h, axis=1, keepdims=True)  # (b, 1)
    # Literal transcription of reference :144 — sum over C, *then* square.
    cost_std = jnp.sqrt(
        jnp.sum(cost_h - cost_mean, axis=1, keepdims=True) ** 2 / C + eps
    )
    a_out = jax.nn.sigmoid(
        lam * (beta_a.astype(f32) - (cost_mean - cost_h) / (cost_std + eps))
    )  # (b, C) f32
    return a_out, mu, sigma_sq


def _e_step(mu, sigma_sq, a_out, v, eps):
    """One E step.  Mirrors models/capsules_ucf101.py:158-182.

    ln_p is elementwise over the big (b, Bi, C, psize) tensor (fused
    with its psize-reduction; v.dtype), the C-softmax runs in f32 on the
    reduced (b, Bi, C) tensor, and r returns in v.dtype for the next
    M step."""
    ln_p = (
        -((v - mu) ** 2) / (2.0 * sigma_sq)
        - jnp.log(jnp.sqrt(sigma_sq))
        - jnp.asarray(0.5 * _LN_2PI, v.dtype)
    )
    ln_ap = jnp.sum(ln_p, axis=3).astype(jnp.float32) + jnp.log(
        eps + a_out[:, None, :]
    )  # (b, Bi, C) f32
    return jax.nn.softmax(ln_ap, axis=2).astype(v.dtype)


def em_routing(
    v: jax.Array,
    a_in: jax.Array,
    beta_u: jax.Array,
    beta_a: jax.Array,
    *,
    iters: int = 3,
    eps: float = 1e-8,
    lam: float = 1e-6,
) -> tuple[jax.Array, jax.Array]:
    """Run EM routing.

    Args:
      v: votes (b, Bi, C, psize) — b is batch*H*W positions.
      a_in: input activations (b, Bi, 1).
      beta_u: (C, psize) per-output-capsule cost bias.
      beta_a: (C,) activation bias.
      iters: static number of EM iterations (reference: 3).

    Returns:
      (mu, a_out): output poses (b, 1, C, psize) in v.dtype and
      activations (b, C) in FLOAT32 — with lam = 1e-6 the activation
      signal is sigmoid deviations of ~1e-3 around 0.5, below bf16's
      resolution there, so a_out never drops to half precision.

    Matches caps_em_routing (models/capsules_ucf101.py:184-211): r is
    initialized uniform 1/C, and the final iteration skips the E step.
    With f32 inputs every operation matches the literal reference form
    (the oracle-test configuration); bf16 inputs run the documented
    mixed-precision scheme (_m_step/_e_step docstrings).
    """
    b, Bi, C, psize = v.shape
    assert a_in.shape == (b, Bi, 1), (a_in.shape, v.shape)

    def loop(v, a_in, beta_u, beta_a):
        r = jnp.full((b, Bi, C), 1.0 / C, dtype=v.dtype)
        a_out = mu = None
        for it in range(iters):
            a_out, mu, sigma_sq = _m_step(
                a_in, r, v, beta_u, beta_a, eps, lam
            )
            if it < iters - 1:
                r = _e_step(mu, sigma_sq, a_out, v, eps)
        return mu, a_out

    if _REMAT:
        loop = jax.checkpoint(loop)
    return loop(v, a_in, beta_u, beta_a)

"""EM routing vs an independent numpy oracle of the reference equations.

The oracle below is a straight transcription of the *documented equations*
of the reference routing (models/capsules_ucf101.py:108-211), written in
per-sample loop form so it shares no structure with the vectorized XLA
implementation under test.
"""

import math

import numpy as np

import jax.numpy as jnp

from picad_tpu.ops.em_routing import em_routing

RNG = np.random.default_rng(2)
EPS = 1e-8
LAM = 1e-6


def oracle(v, a_in, beta_u, beta_a, iters=3):
    b, Bi, C, psize = v.shape
    mu_out = np.zeros((b, 1, C, psize))
    a_out_final = np.zeros((b, C))
    for n in range(b):
        r = np.full((Bi, C), 1.0 / C)
        for it in range(iters):
            # m step
            rr = r * a_in[n]  # (Bi, C) * (Bi, 1)
            rr = rr / (rr.sum(axis=1, keepdims=True) + EPS)
            r_sum = rr.sum(axis=0)  # (C,)
            coeff = rr / (r_sum[None, :] + EPS)  # (Bi, C)
            mu = np.einsum("ij,ijp->jp", coeff, v[n])  # (C, psize)
            sigma_sq = (
                np.einsum("ij,ijp->jp", coeff, (v[n] - mu[None]) ** 2) + EPS
            )
            cost = (beta_u + np.log(np.sqrt(sigma_sq))) * r_sum[:, None]
            cost = cost.sum(axis=1)  # (C,)
            cmean = cost.mean()
            cstd = math.sqrt((cost - cmean).sum() ** 2 / C + EPS)
            a_out = 1.0 / (
                1.0 + np.exp(-(LAM * (beta_a - (cmean - cost) / (cstd + EPS))))
            )
            if it < iters - 1:
                # e step
                ln_p = (
                    -((v[n] - mu[None]) ** 2) / (2 * sigma_sq[None])
                    - np.log(np.sqrt(sigma_sq[None]))
                    - 0.5 * math.log(2 * math.pi)
                )
                ln_ap = ln_p.sum(axis=2) + np.log(EPS + a_out[None, :])
                e = np.exp(ln_ap - ln_ap.max(axis=1, keepdims=True))
                r = e / e.sum(axis=1, keepdims=True)
        mu_out[n, 0] = mu
        a_out_final[n] = a_out
    return mu_out, a_out_final


def test_em_routing_matches_oracle():
    b, Bi, C, psize = 5, 8, 6, 16
    v = RNG.standard_normal((b, Bi, C, psize)).astype(np.float32)
    a_in = RNG.uniform(0.01, 0.99, (b, Bi, 1)).astype(np.float32)
    beta_u = RNG.standard_normal((C, psize)).astype(np.float32)
    beta_a = RNG.standard_normal((C,)).astype(np.float32)

    mu_ref, a_ref = oracle(
        v.astype(np.float64), a_in.astype(np.float64), beta_u, beta_a
    )
    mu, a = em_routing(
        jnp.asarray(v), jnp.asarray(a_in), jnp.asarray(beta_u), jnp.asarray(beta_a)
    )
    # The reference's cost_std quirk (sum-then-square) makes it ~sqrt(eps),
    # amplifying f32 rounding vs the f64 oracle — hence the loose atol.
    np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(a), a_ref, rtol=1e-2, atol=1e-4)


def test_em_routing_single_iteration():
    b, Bi, C, psize = 2, 4, 3, 4
    v = RNG.standard_normal((b, Bi, C, psize))
    a_in = RNG.uniform(0.1, 0.9, (b, Bi, 1))
    beta_u = RNG.standard_normal((C, psize))
    beta_a = RNG.standard_normal((C,))
    mu_ref, a_ref = oracle(v, a_in, beta_u, beta_a, iters=1)
    mu, a = em_routing(
        jnp.asarray(v, dtype=jnp.float32),
        jnp.asarray(a_in, dtype=jnp.float32),
        jnp.asarray(beta_u, dtype=jnp.float32),
        jnp.asarray(beta_a, dtype=jnp.float32),
        iters=1,
    )
    np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a), a_ref, rtol=1e-3, atol=1e-5)


def test_em_remat_is_identity(monkeypatch):
    """PICAD_EM_REMAT wraps the loop in jax.checkpoint — values AND
    gradients must be bit-comparable to the plain path (checkpoint
    recomputes the same ops)."""
    import importlib

    import jax

    # NOT `import picad_tpu.ops.em_routing as em`: the ops package
    # re-exports the em_routing FUNCTION under the same name, and
    # `import a.b as c` resolves through getattr(a, "b") first
    em = importlib.import_module("picad_tpu.ops.em_routing")

    rng = np.random.default_rng(21)
    b, Bi, C, psize = 12, 8, 6, 16
    v = jnp.asarray(rng.standard_normal((b, Bi, C, psize)), jnp.float32)
    a = jnp.asarray(rng.uniform(size=(b, Bi, 1)), jnp.float32)
    bu = jnp.asarray(rng.standard_normal((C, psize)), jnp.float32)
    ba = jnp.asarray(rng.standard_normal((C,)), jnp.float32)

    def loss(v, a):
        mu, ao = em.em_routing(v, a, bu, ba)
        return jnp.sum(mu.astype(jnp.float32) ** 2) + jnp.sum(ao**2)

    base = jax.grad(loss, argnums=(0, 1))(v, a)
    base_val = loss(v, a)
    monkeypatch.setattr(em, "_REMAT", True)
    remat = jax.grad(loss, argnums=(0, 1))(v, a)
    remat_val = loss(v, a)
    # checkpoint re-traces the same ops but XLA fuses/reassociates the
    # recomputed chain differently; the EM grad's own f32 noise floor
    # (measured against an f64 oracle on these inputs) is ~2.5e-3 abs
    # for both paths, so the budget below is that floor, not semantics
    np.testing.assert_allclose(float(base_val), float(remat_val), rtol=1e-5)
    for g0, g1 in zip(base, remat):
        np.testing.assert_allclose(
            np.asarray(g0), np.asarray(g1), rtol=1e-2, atol=2e-3
        )

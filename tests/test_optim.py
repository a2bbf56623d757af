"""Optimizer/scheduler parity vs torch."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from picad_tpu.train.optimizer import ReduceLROnPlateau, make_optimizer


def test_adam_matches_torch():
    """optax.adam(eps_root=0) == torch.optim.Adam(lr, eps=1e-6, wd=0)."""
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal(16).astype(np.float32)

    wt = torch.tensor(w0.copy(), requires_grad=True)
    topt = torch.optim.Adam([wt], lr=1e-4, weight_decay=0, eps=1e-6)

    opt = make_optimizer(1e-4, eps=1e-6)
    wj = jnp.asarray(w0)
    st = opt.init(wj)

    for step in range(5):
        g = rng.standard_normal(16).astype(np.float32)
        topt.zero_grad()
        wt.grad = torch.tensor(g)
        topt.step()
        updates, st = opt.update(jnp.asarray(g), st, wj)
        wj = optax.apply_updates(wj, updates)
        np.testing.assert_allclose(
            np.asarray(wj), wt.detach().numpy(), rtol=1e-5, atol=1e-7
        )


def test_reduce_lr_on_plateau_matches_torch():
    t = torch.optim.Adam([torch.zeros(1, requires_grad=True)], lr=1.0)
    sched_t = torch.optim.lr_scheduler.ReduceLROnPlateau(
        t, "min", min_lr=1e-7, patience=5, factor=0.1
    )
    sched_j = ReduceLROnPlateau(1.0, factor=0.1, patience=5, min_lr=1e-7)

    rng = np.random.default_rng(1)
    # losses that improve, stall, improve again
    losses = list(2.0 - 0.1 * np.arange(5)) + [1.6] * 9 + [0.5] + [0.5] * 9
    for loss in losses:
        sched_t.step(loss)
        lr_j = sched_j.step(loss)
        lr_t = t.param_groups[0]["lr"]
        assert abs(lr_j - lr_t) < 1e-9, (loss, lr_j, lr_t)


def test_lr_injection_does_not_retrace():
    opt = make_optimizer(1e-3)
    params = jnp.zeros(4)
    st = opt.init(params)
    traces = []

    @jax.jit
    def upd(g, st, p):
        traces.append(1)
        u, st = opt.update(g, st, p)
        return optax.apply_updates(p, u), st

    p, st = upd(jnp.ones(4), st, params)
    st.hyperparams["learning_rate"] = jnp.asarray(1e-4, jnp.float32)
    p, st = upd(jnp.ones(4), st, p)
    assert len(traces) == 1  # LR change rides in state, no retrace
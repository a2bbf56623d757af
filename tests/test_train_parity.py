"""Train-mode golden parity: one full train step vs torch autograd.

Closes the gap between "every op matches" (the per-op oracles) and "the
training trajectory matches": on converted reference-format weights and
identical inputs, the PRODUCTION train step (picad_tpu.train.step with
an SGD(1.0) optimizer, so new_params = params - grads) must reproduce
the torch oracle's loss, every parameter gradient, and the BatchNorm
running-statistic updates of train_model_interface
(main_ucf101.py:50-150).

Gradients are compared in the JAX tree layout by running the torch
gradient dict through the SAME checkpoint converter as the weights —
the converter is an element permutation (transposes/flips), which maps
gradients exactly as it maps parameters.

Deterministic setup: dropout rate 0 (both sides), plain-L2 consistency,
epoch < thresh_epoch (no pseudo-label branch), fold_flip=False (two
sequential forwards, the literal reference execution order).

heavy: two full 96^2 CapsNet compiles + a float64 torch double-forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
import torch

from picad_tpu.checkpoint.torch_convert import (
    convert_capsnet_state_dict,
    merge_into_variables,
)
from picad_tpu.config import LossConfig
from picad_tpu.models.capsules import CapsNet
from picad_tpu.train.state import create_train_state
from picad_tpu.train.step import make_train_step
from tests.sd_fixtures import fake_capsnet_state_dict


@pytest.mark.heavy
def test_train_step_loss_grads_and_bn_stats(require_accelerator):
    sd = fake_capsnet_state_dict(scale=0.05)
    params, stats, n = convert_capsnet_state_dict(sd)

    H = 96
    B = 2
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, (B, 8, H, H, 3)).astype(np.float32)
    seg_gt = (rng.random((B, 8, H, H)) > 0.7).astype(np.float32)
    labels = np.array([3, 11], np.int64)
    flags = np.array([1.0, 0.0], np.float32)  # row 0 labeled, row 1 not

    cfg = LossConfig(
        loc_loss="dice", const_loss="l2", wt_loc=1.0, wt_cls=1.0,
        wt_cons=0.1, bv=False, gv=False, thresh_epoch=11,
    )

    # ---- torch oracle (float64) ----
    from tests.torch_oracle import train_loss_torch

    t = {}
    for k, v in sd.items():
        tensor = torch.from_numpy(np.asarray(v)).double()
        if k.endswith(("running_mean", "running_var")):
            t[k] = tensor.clone()  # updated in place by train-mode BN
        else:
            t[k] = tensor.requires_grad_(True)
    img_t = torch.from_numpy(
        np.ascontiguousarray(np.transpose(img, (0, 4, 1, 2, 3)))
    ).double()
    aug_t = torch.flip(img_t, dims=[4])
    loss_t = train_loss_torch(
        t, img_t, aug_t, torch.from_numpy(seg_gt).double(),
        torch.from_numpy(labels), torch.from_numpy(flags).double(),
        wt_cons=cfg.wt_cons, epoch=1, thresh_epoch=cfg.thresh_epoch,
    )
    loss_t.backward()
    grads_sd = {
        k: v.grad.numpy().astype(np.float32)
        for k, v in t.items()
        if v.grad is not None
    }
    # map torch grads into the JAX tree layout with the SAME converter
    grads_params, _, _ = convert_capsnet_state_dict(
        {**{k: g for k, g in grads_sd.items()},
         **{k: np.zeros_like(np.asarray(v)) for k, v in sd.items()
            if k not in grads_sd}}
    )
    stats_sd = {
        k: v.detach().numpy().astype(np.float32)
        for k, v in t.items()
        if k.endswith(("running_mean", "running_var"))
    }
    _, stats_updated, _ = convert_capsnet_state_dict(
        {**{k: np.asarray(v) for k, v in sd.items()}, **stats_sd}
    )

    # ---- the production JAX train step, SGD(1.0) => grads by difference
    model = CapsNet(num_classes=24, dropout_rate=0.0, bn_groups=1)
    opt = optax.sgd(1.0)
    state = create_train_state(
        model, opt, rng=jax.random.PRNGKey(0),
        sample_input_shape=(1, 8, H, H, 3),
    )
    variables = merge_into_variables(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)},
        params, stats,
    )
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    step = jax.jit(make_train_step(model, opt, cfg, fold_flip=False))
    batch = {
        "data": jnp.asarray(img),
        "aug_data": jnp.flip(jnp.asarray(img), axis=3),
        "loc_msk": jnp.asarray(seg_gt)[..., None],
        "action": jnp.asarray(labels.astype(np.int32)),
        "label_vid": jnp.asarray(flags),
        "row_mask": jnp.ones((B,), jnp.float32),
    }
    new_state, metrics = step(
        state, batch, jnp.asarray(1.0, jnp.float32),
        jnp.asarray(0.5, jnp.float32),
    )

    # loss parity
    np.testing.assert_allclose(
        float(metrics["loss"]), float(loss_t), rtol=1e-4
    )

    # gradient parity, leaf by leaf in the converted layout
    jax_grads = jax.tree.map(
        lambda a, b: np.asarray(a) - np.asarray(b),
        jax.device_get(state.params), jax.device_get(new_state.params),
    )
    flat_ref = jax.tree_util.tree_flatten_with_path(grads_params)[0]
    flat_jax = dict(
        (jax.tree_util.keystr(p), np.asarray(v))
        for p, v in jax.tree_util.tree_flatten_with_path(jax_grads)[0]
    )
    checked = 0
    for path, ref in flat_ref:
        key = jax.tree_util.keystr(path)
        got = flat_jax[key]
        scale = max(float(np.abs(ref).max()), 1e-12)
        np.testing.assert_allclose(
            got, ref, rtol=2e-4, atol=2e-4 * scale, err_msg=key
        )
        checked += 1
    assert checked >= 60  # all converted parameter tensors compared

    # BatchNorm running-statistic updates (two sequential forwards)
    flat_ref_stats = jax.tree_util.tree_flatten_with_path(stats_updated)[0]
    flat_jax_stats = dict(
        (jax.tree_util.keystr(p), np.asarray(v))
        for p, v in jax.tree_util.tree_flatten_with_path(
            jax.device_get(new_state.batch_stats)
        )[0]
    )
    for path, ref in flat_ref_stats:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            flat_jax_stats[key], ref, rtol=1e-4, atol=1e-6, err_msg=key
        )

"""TorchBatchNorm vs nn.BatchNorm3d(eps=1e-3, momentum=0.01) on CPU."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from picad_tpu.models.layers import TorchBatchNorm

RNG = np.random.default_rng(1)


def _run_torch(x_steps, training):
    bn = torch.nn.BatchNorm3d(x_steps[0].shape[1], eps=1e-3, momentum=0.01)
    bn.weight.data = torch.from_numpy(
        RNG.standard_normal(x_steps[0].shape[1]).astype(np.float32)
    )
    bn.bias.data = torch.from_numpy(
        RNG.standard_normal(x_steps[0].shape[1]).astype(np.float32)
    )
    bn.train(training)
    outs = [bn(torch.from_numpy(x)).detach().numpy() for x in x_steps]
    return bn, outs


def test_batchnorm_train_and_eval_match_torch():
    c = 6
    x_steps = [RNG.standard_normal((2, c, 3, 4, 4)).astype(np.float32) for _ in range(3)]
    bn_t, outs_t = _run_torch(x_steps, training=True)

    mod = TorchBatchNorm()
    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 1, 1, c)), False)
    params = {
        "scale": jnp.asarray(bn_t.weight.detach().numpy()),
        "bias": jnp.asarray(bn_t.bias.detach().numpy()),
    }
    stats = variables["batch_stats"]

    for x, ref in zip(x_steps, outs_t):
        xj = jnp.asarray(np.moveaxis(x, 1, -1))
        out, mut = mod.apply(
            {"params": params, "batch_stats": stats},
            xj,
            False,
            mutable=["batch_stats"],
        )
        stats = mut["batch_stats"]
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(out), -1, 1), ref, rtol=1e-4, atol=1e-4
        )

    # Running stats after 3 train steps must match torch's.
    np.testing.assert_allclose(
        np.asarray(stats["mean"]), bn_t.running_mean.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]), bn_t.running_var.numpy(), rtol=1e-4, atol=1e-5
    )

    # Eval mode uses the running stats.
    bn_t.eval()
    x = x_steps[0]
    ref_eval = bn_t(torch.from_numpy(x)).detach().numpy()
    out_eval = mod.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.moveaxis(x, 1, -1)),
        True,
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out_eval), -1, 1), ref_eval, rtol=1e-4, atol=1e-4
    )

"""Component-level timing of the train step on the attached device.

Times standalone jitted pieces at the bench configuration (bs=8, bf16,
folded 2B=16 forward) so the step cost can be attributed:

  encoder fwd / encoder fwd+bwd / full fwd / full fwd+bwd /
  masks / full train step (bv) / full train step (plain l2)

Usage: python tools/profile_step.py [--bs 8] [--hw 224]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    args = ap.parse_args()

    from picad_tpu.config import LossConfig
    from picad_tpu.models.capsules import CapsNet
    from picad_tpu.models.i3d import InceptionI3d
    from picad_tpu.ops.masks import pixelwise_cyclic_variance, pixelwise_gradient
    from picad_tpu.train.optimizer import make_optimizer
    from picad_tpu.train.state import create_train_state
    from picad_tpu.train.step import make_train_step

    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    B, H = args.bs, args.hw
    B2 = 2 * B
    rng = jax.random.PRNGKey(0)
    img2 = jax.random.uniform(rng, (B2, 8, H, H, 3), jnp.float32)

    results = {}

    # ---- encoder ----
    enc = InceptionI3d(final_endpoint="Mixed_4f", compute_dtype=dt, bn_groups=2)
    enc_vars = enc.init(rng, img2[:2], False)

    @jax.jit
    def enc_fwd(v, x):
        out, _ = enc.apply(v, x, True, mutable=["batch_stats"])
        return jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32)), out)

    results["encoder fwd (2B)"] = timeit(enc_fwd, enc_vars, img2)

    @jax.jit
    def enc_fwdbwd(v, x):
        def loss(p):
            out, _ = enc.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, True, mutable=["batch_stats"],
            )
            return sum(jnp.sum(a.astype(jnp.float32) ** 2) for a in out)
        return jax.grad(loss)(v["params"])

    results["encoder fwd+bwd (2B)"] = timeit(enc_fwdbwd, enc_vars, img2)

    # ---- full model ----
    model = CapsNet(num_classes=24, compute_dtype=dt, bn_groups=2)
    variables = model.init(
        {"params": rng, "dropout": rng},
        img2[:2], jnp.zeros((2,), jnp.int32), jnp.ones((2,), jnp.float32),
        0, 0, False,
    )
    action2 = jnp.zeros((B2,), jnp.int32)
    flags2 = jnp.ones((B2,), jnp.float32)

    @jax.jit
    def full_fwd(v, x):
        seg, scores, _ = model.apply(
            v, x, action2, flags2, 12, 11, True,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )[0]
        return jnp.sum(seg) + jnp.sum(scores)

    results["full fwd (2B)"] = timeit(full_fwd, variables, img2)

    @jax.jit
    def full_fwdbwd(v, x):
        def loss(p):
            (seg, scores, _), _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, action2, flags2, 12, 11, True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            return jnp.sum(seg**2) + jnp.sum(scores**2)
        return jax.grad(loss)(v["params"])

    results["full fwd+bwd (2B)"] = timeit(full_fwdbwd, variables, img2)

    # ---- masks ----
    seg1 = jax.random.normal(rng, (B, 8, H, H), jnp.float32)
    seg2 = jax.random.normal(jax.random.PRNGKey(1), (B, 8, H, H), jnp.float32)

    @jax.jit
    def masks(a, b):
        clck = pixelwise_cyclic_variance(a, jnp.flip(b, axis=1), window=5)
        anti = pixelwise_cyclic_variance(jnp.flip(a, axis=1), b, window=5)
        return jnp.sum(clck) + jnp.sum(anti) + jnp.sum(pixelwise_gradient(a))

    results["masks (bv x2 + gv)"] = timeit(masks, seg1, seg2)

    # ---- full train steps ----
    optimizer = make_optimizer(1e-4)
    state = create_train_state(
        model, optimizer, rng=jax.random.PRNGKey(47),
        sample_input_shape=(1, 8, H, H, 3),
    )
    nprng = np.random.default_rng(47)
    batch = {
        "data": nprng.random((B, 8, H, H, 3), dtype=np.float32),
        "aug_data": nprng.random((B, 8, H, H, 3), dtype=np.float32),
        "loc_msk": (nprng.random((B, 8, H, H, 1)) > 0.7).astype(np.float32),
        "action": nprng.integers(0, 24, (B,)).astype(np.int32),
        "label_vid": (np.arange(B) % 2).astype(np.int32),
    }
    batch = jax.device_put(batch)
    epoch = jnp.asarray(12.0, jnp.float32)
    ramp = jnp.asarray(0.5, jnp.float32)

    bv_cfg = LossConfig(bv=True, n_frames=5, wt_cons=0.1, thresh_epoch=11)
    model_unfused = CapsNet(
        num_classes=24, compute_dtype=dt, bn_groups=2, fused_head=False
    )
    state_unfused = create_train_state(
        model_unfused, optimizer, rng=jax.random.PRNGKey(47),
        sample_input_shape=(1, 8, H, H, 3),
    )
    for name, mdl, st, cfg in [
        ("train step (bv, fused)", model, state, bv_cfg),
        ("train step (bv, unfused)", model_unfused, state_unfused, bv_cfg),
        ("train step (plain l2)", model, state,
         LossConfig(bv=False, gv=False, wt_cons=0.1, thresh_epoch=11)),
    ]:
        step = jax.jit(
            make_train_step(mdl, optimizer, cfg, fold_flip=True),
        )

        def run(s_, b_):
            s2, m = step(s_, b_, epoch, ramp)
            return m["loss"]

        results[name] = timeit(run, st, batch, warmup=3, iters=10)

    print(f"\ndevice: {jax.devices()[0].platform}, bs={B}, hw={H}, dtype={args.dtype}")
    for k, v in results.items():
        print(f"  {k:28s} {v:8.2f} ms")
    step_ms = results["train step (bv, fused)"]
    print(f"  -> clips/s/chip @bs{B}: {B / step_ms * 1000:.1f}")


if __name__ == "__main__":
    main()

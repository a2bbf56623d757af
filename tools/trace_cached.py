"""Trace the plain train step and the device-cache ASSEMBLER program.

Historical record (2026-08-19, v5e, bs=8, 224^2): the round-3 design
fused the crop-gather into the train step; tracing plain-vs-fused showed
the fused step paid ~9.2 ms/step of relayout the plain step fuses away —
  reverse  f32[8,8,224,224,3]          12.60 ms / 3 steps  (the flip)
  reshape+copy bf16[8,4,2,112,2,112,2,3] 11.14 ms / 3 steps (s2d stem)
  multiply_convert_fusion f32->bf16      4.05 ms / 3 steps  (/255)
while the gather itself costs ~0.9 ms (tools/probe_gather.py).  That
measurement drove the split: assembly is now its own jitted program on
the loader's prefetch thread (data/device_cache.py make_assembler_put)
and the train step is the SAME executable as the streaming path.

This tool traces both programs of the current architecture and prints
their top-op tables.

Usage: python tools/trace_cached.py [--top 25]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.trace_step import report

BS, H = 8, 224


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", type=str, default="/tmp/picad_trace_cached")
    args = ap.parse_args()

    from picad_tpu.config import LossConfig
    from picad_tpu.data.device_cache import (
        DeviceClipDataset,
        DeviceVideoCache,
        make_assembler_put,
    )
    from picad_tpu.data.loader import SemiSupervisedBatcher
    from picad_tpu.data.sources import ConcatVideoSource, SyntheticVideoSource
    from picad_tpu.models.capsules import CapsNet
    from picad_tpu.train.optimizer import make_optimizer
    from picad_tpu.train.state import create_train_state
    from picad_tpu.train.step import make_train_step

    model = CapsNet(num_classes=24, compute_dtype=jnp.bfloat16, bn_groups=2)
    opt = make_optimizer(1e-4)
    state = create_train_state(
        model, opt, rng=jax.random.PRNGKey(47),
        sample_input_shape=(1, 8, H, H, 3),
    )
    step = jax.jit(
        make_train_step(
            model, opt,
            LossConfig(bv=True, n_frames=5, wt_cons=0.1, thresh_epoch=11),
            fold_flip=True,
        ),
        donate_argnums=(0,),
    )

    def make_src(labeled, seed):
        return SyntheticVideoSource(
            BS * 2, video_len=40, labeled_fraction=labeled, seed=seed
        )

    cache = DeviceVideoCache.build(
        ConcatVideoSource([make_src(1.0, 1), make_src(0.0, 2)]),
        budget_bytes=4 << 30,
    )
    pools = {"pool_video": cache.pool_video, "pool_mask": cache.pool_mask}
    n_l = BS * 2
    mkd = lambda off, n: DeviceClipDataset(
        cache, index_offset=off, length=n, train=True, clip_shape=(H, H)
    )
    batcher = SemiSupervisedBatcher(
        mkd(0, n_l), mkd(n_l, BS * 2), batch_size=BS, seed=0, workers=2,
        process_index=0, process_count=1,
    )
    assembler = make_assembler_put(pools, (H, H))
    meta = next(iter(batcher.epoch(1)))

    epoch = jnp.asarray(12.0, jnp.float32)
    ramp = jnp.asarray(0.5, jnp.float32)

    # warm both programs
    batch = assembler(meta)
    for _ in range(3):
        state, m = step(state, assembler(meta), epoch, ramp)
    float(m["loss"])

    out = os.path.join(args.out, "assembler")
    with jax.profiler.trace(out):
        for _ in range(10):
            batch = assembler(meta)
        jax.block_until_ready(batch)
    print("\n===== assembler program (10 calls) =====", flush=True)
    report(out, top=args.top)

    out = os.path.join(args.out, "step")
    with jax.profiler.trace(out):
        for _ in range(3):
            state, m = step(state, batch, epoch, ramp)
        float(m["loss"])
    print("\n===== plain train step (3 calls) =====", flush=True)
    report(out, top=args.top)


if __name__ == "__main__":
    main()

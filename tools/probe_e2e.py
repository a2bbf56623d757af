"""Probe: where does the device-cache e2e path lose time vs device rate?

Round-3 bench: 105.16 clips/s device-resident vs 93.02 e2e.  The round-4
trace (tools/trace_cached.py) showed the loss was NOT host dispatch: the
in-step crop-gather's layout choices leaked ~9 ms/step of relayout
copies (f32 reverse for the flip, s2d reshape+copy, unfused /255) into
the step body.  The fix: assembly moved into a separate tiny jitted
program on the loader's prefetch thread (data/device_cache.py
make_assembler_put) and the train step is the PLAIN program again.

This times each stage of the production path:

  1. device-resident rate of the PLAIN step (pre-staged pixel batch)
  2. batcher-only: host metadata assembly rate, no device in the loop
  3. put-only: per-step jax.device_put of a metadata batch (unoverlapped
     dispatch cost that PrefetchLoader hides)
  4. assemble-only: the assembler program over a staged metadata batch
  5. e2e: metadata batcher -> PrefetchLoader(put_fn=assembler) -> plain
     step (the production device-cache flow)

Usage: python tools/probe_e2e.py [steps]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BS, H = 8, 224


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    import jax
    import jax.numpy as jnp

    from picad_tpu.config import LossConfig
    from picad_tpu.data.device_cache import (
        DeviceClipDataset,
        DeviceVideoCache,
        make_assembler_put,
    )
    from picad_tpu.data.loader import PrefetchLoader, SemiSupervisedBatcher
    from picad_tpu.data.sources import ConcatVideoSource, SyntheticVideoSource
    from picad_tpu.models.capsules import CapsNet
    from picad_tpu.parallel.mesh import (
        batch_sharding, create_mesh, replicated_sharding,
    )
    from picad_tpu.train.optimizer import make_optimizer
    from picad_tpu.train.state import create_train_state
    from picad_tpu.train.step import make_train_step

    mesh = create_mesh()
    repl = replicated_sharding(mesh)
    shard = batch_sharding(mesh)

    model = CapsNet(num_classes=24, compute_dtype=jnp.bfloat16, bn_groups=2)
    opt = make_optimizer(1e-4)
    state = create_train_state(
        model, opt, rng=jax.random.PRNGKey(47),
        sample_input_shape=(1, 8, H, H, 3),
    )
    state = jax.device_put(state, repl)
    loss_cfg = LossConfig(bv=True, n_frames=5, wt_cons=0.1, thresh_epoch=11)

    def make_src(labeled, seed):
        return SyntheticVideoSource(
            BS * 2, video_len=40, labeled_fraction=labeled, seed=seed
        )

    cache = DeviceVideoCache.build(
        ConcatVideoSource([make_src(1.0, 1), make_src(0.0, 2)]),
        budget_bytes=4 << 30,
        device_put=lambda x: jax.device_put(x, repl),
    )
    pools = {"pool_video": cache.pool_video, "pool_mask": cache.pool_mask}
    n_l = BS * 2
    mkd = lambda off, n: DeviceClipDataset(
        cache, index_offset=off, length=n, train=True, clip_shape=(H, H)
    )

    def make_batcher():
        return SemiSupervisedBatcher(
            mkd(0, n_l), mkd(n_l, BS * 2), batch_size=BS, seed=0, workers=2,
            process_index=0, process_count=1,
        )

    step = jax.jit(
        make_train_step(model, opt, loss_cfg, fold_flip=True),
        in_shardings=(repl, shard, None, None),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    epoch_arr = jnp.asarray(12.0, jnp.float32)
    ramp = jnp.asarray(0.5, jnp.float32)

    def epochs_forever(loader_epoch_fn):
        e = 1
        while True:
            yield from loader_epoch_fn(e)
            e += 1

    assembler = make_assembler_put(pools, (H, H), sharding=shard)

    # compile once (assembler + plain step, one trace each)
    b0 = next(iter(PrefetchLoader(make_batcher().epoch(1), put_fn=assembler)))
    compiled = step.lower(state, b0, epoch_arr, ramp).compile()
    state, m = compiled(state, b0, epoch_arr, ramp)
    float(m["loss"])
    print("compiled", flush=True)

    # 1. device-resident ceiling (plain step, pre-staged batch)
    for _ in range(3):
        state, m = compiled(state, b0, epoch_arr, ramp)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = compiled(state, b0, epoch_arr, ramp)
    float(m["loss"])
    dt = time.perf_counter() - t0
    print(f"1. device-resident : {steps * BS / dt:7.2f} clips/s "
          f"({dt / steps * 1e3:.2f} ms/step)", flush=True)

    # 2. batcher-only host rate
    batcher = make_batcher()
    n = 0
    t0 = time.perf_counter()
    for e in range(1, 100):
        for b in batcher.epoch(e):
            n += 1
        if n >= steps:
            break
    dt = time.perf_counter() - t0
    print(f"2. batcher-only    : {n * BS / dt:7.2f} clips/s "
          f"({dt / n * 1e3:.2f} ms/step)", flush=True)

    # 3. device_put-only rate of one metadata batch
    host_b = next(iter(make_batcher().epoch(1)))
    for _ in range(3):
        jax.block_until_ready(jax.device_put(host_b, shard))
    t0 = time.perf_counter()
    for _ in range(steps):
        jax.block_until_ready(jax.device_put(host_b, shard))
    dt = time.perf_counter() - t0
    print(f"3. put-only        : {steps * BS / dt:7.2f} clips/s "
          f"({dt / steps * 1e3:.2f} ms/step)", flush=True)

    # 4. assembler-only over a staged metadata batch
    for _ in range(3):
        jax.block_until_ready(assembler(host_b))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = assembler(host_b)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"4. assemble-only   : {steps * BS / dt:7.2f} clips/s "
          f"({dt / steps * 1e3:.2f} ms/step, put included)", flush=True)

    # 5. e2e: the production device-cache flow
    it = iter(PrefetchLoader(
        epochs_forever(lambda e: make_batcher().epoch(e)),
        put_fn=assembler, prefetch=2,
    ))
    for _ in range(3):
        state, m = compiled(state, next(it), epoch_arr, ramp)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = compiled(state, next(it), epoch_arr, ramp)
    float(m["loss"])
    dt = time.perf_counter() - t0
    print(f"5. e2e assembler   : {steps * BS / dt:7.2f} clips/s "
          f"({dt / steps * 1e3:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()

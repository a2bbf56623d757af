"""Benchmark: UCF101-24 semi-supervised train throughput, clips/sec/chip.

Runs the full jitted train step (both forwards, variance masks, backward,
Adam) on device-resident synthetic batches at the BASELINE configuration
(bs=8, 8-frame 224x224 clips, --bv --n_frames 5 consistency), and prints
ONE JSON line.

`vs_baseline` compares against REFERENCE_CLIPS_PER_SEC — the reference's
measured-era throughput anchor.  The reference repo publishes no
throughput numbers (BASELINE.md); 20 clips/s is our documented estimate
for its per-step time on the single CUDA GPU it targeted (two CapsNet
forwards + backward at bs=8 plus its serial numpy mask loop and
per-batch H2D copies).  The driver's north star is >=5x this.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_CLIPS_PER_SEC = 20.0
BS = 8
H = W = 224
WARMUP_STEPS = 3
MEASURE_STEPS = 20


def main():
    from picad_tpu.config import LossConfig
    from picad_tpu.models.capsules import CapsNet
    from picad_tpu.parallel.mesh import batch_sharding, create_mesh, replicated_sharding
    from picad_tpu.train.optimizer import make_optimizer
    from picad_tpu.train.state import create_train_state
    from picad_tpu.train.step import make_train_step

    mesh = create_mesh()
    repl = replicated_sharding(mesh)
    shard = batch_sharding(mesh)
    n_chips = mesh.size

    model = CapsNet(num_classes=24, compute_dtype=jnp.bfloat16, bn_groups=2)
    optimizer = make_optimizer(1e-4)
    state = create_train_state(
        model, optimizer, rng=jax.random.PRNGKey(47),
        sample_input_shape=(1, 8, H, W, 3),
    )
    state = jax.device_put(state, repl)

    loss_cfg = LossConfig(bv=True, n_frames=5, wt_cons=0.1, thresh_epoch=11)
    train_step = jax.jit(
        make_train_step(model, optimizer, loss_cfg, fold_flip=True),
        in_shardings=(repl, shard, None, None),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

    rng = np.random.default_rng(47)
    batch = {
        "data": rng.random((BS, 8, H, W, 3), dtype=np.float32),
        "aug_data": rng.random((BS, 8, H, W, 3), dtype=np.float32),
        "loc_msk": (rng.random((BS, 8, H, W, 1)) > 0.7).astype(np.float32),
        "action": rng.integers(0, 24, (BS,)).astype(np.int32),
        "label_vid": (np.arange(BS) % 2).astype(np.int32),
    }
    batch = jax.device_put(batch, shard)
    epoch = jnp.asarray(12.0, jnp.float32)
    ramp = jnp.asarray(0.5, jnp.float32)

    for _ in range(WARMUP_STEPS):
        state, metrics = train_step(state, batch, epoch, ramp)
    float(metrics["loss"])  # force completion (D2H fetch)

    t0 = time.perf_counter()
    all_metrics = []
    for _ in range(MEASURE_STEPS):
        state, metrics = train_step(state, batch, epoch, ramp)
        all_metrics.append(metrics["loss"])
    # Force real completion of the whole chain with value fetches —
    # block_until_ready alone has proven unreliable on tunneled backends.
    all_metrics = [float(v) for v in all_metrics]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(all_metrics)), all_metrics

    clips_per_sec = MEASURE_STEPS * BS / dt
    per_chip = clips_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "ucf101_train_clips_per_sec_per_chip_bs8",
                "value": round(per_chip, 2),
                "unit": "clips/sec/chip",
                "vs_baseline": round(per_chip / REFERENCE_CLIPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

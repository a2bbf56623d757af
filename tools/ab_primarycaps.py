"""In-context A/B: PrimaryCaps as ONE merged 544-channel conv vs TWO
separate pose/act convs (models/capsules.py `_PCAPS_SPLIT`).

Resolves the round-3 contradiction: an early measurement (different step
composition) found the merged XLA conv +1.5 ms slower than two convs,
but the merged form later became the default without a re-measurement
in the final step.  This times the FULL jitted train step both ways at
the bench configuration — the decision measurement, in-context (XLA's
fusion decisions differ in-context vs standalone).

Usage (on a TPU-attached host):
    python tools/ab_primarycaps.py [steps]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def step_time(split: bool, steps: int = 20) -> float:
    import jax
    import jax.numpy as jnp

    import picad_tpu.models.capsules as capsules

    capsules._PCAPS_SPLIT = split

    from picad_tpu.config import LossConfig
    from picad_tpu.parallel.mesh import (
        batch_sharding, create_mesh, replicated_sharding,
    )
    from picad_tpu.train.optimizer import make_optimizer
    from picad_tpu.train.state import create_train_state
    from picad_tpu.train.step import make_train_step

    BS, H = 8, 224
    mesh = create_mesh()
    repl = replicated_sharding(mesh)
    shard = batch_sharding(mesh)
    model = capsules.CapsNet(
        num_classes=24, compute_dtype=jnp.bfloat16, bn_groups=2
    )
    opt = make_optimizer(1e-4)
    state = create_train_state(
        model, opt, rng=jax.random.PRNGKey(47),
        sample_input_shape=(1, 8, H, H, 3),
    )
    state = jax.device_put(state, repl)
    step = jax.jit(
        make_train_step(model, opt, LossConfig(bv=True, n_frames=5,
                                               wt_cons=0.1, thresh_epoch=11),
                        fold_flip=True),
        in_shardings=(repl, shard, None, None),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    rng = np.random.default_rng(47)
    batch = jax.device_put({
        "data": rng.integers(0, 256, (BS, 8, H, H, 3), dtype=np.uint8),
        "loc_msk": (rng.random((BS, 8, H, H, 1)) > 0.7).astype(np.uint8),
        "action": rng.integers(0, 24, (BS,)).astype(np.int32),
        "label_vid": (np.arange(BS) % 2).astype(np.int32),
        "row_mask": np.ones((BS,), np.float32),
    }, shard)
    epoch = jnp.asarray(12.0, jnp.float32)
    ramp = jnp.asarray(0.5, jnp.float32)
    for _ in range(3):
        state, metrics = step(state, batch, epoch, ramp)
    float(metrics["loss"])
    t0 = time.perf_counter()
    losses = []
    for _ in range(steps):
        state, metrics = step(state, batch, epoch, ramp)
        losses.append(metrics["loss"])
    losses = [float(v) for v in losses]  # value-fetch completion
    dt = (time.perf_counter() - t0) / steps
    assert all(np.isfinite(losses)), losses
    return dt


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    t_merged = step_time(False, steps)
    print(f"merged 544ch conv : {t_merged * 1e3:8.2f} ms/step "
          f"({8 / t_merged:.1f} clips/s)", flush=True)
    t_split = step_time(True, steps)
    print(f"split pose+act    : {t_split * 1e3:8.2f} ms/step "
          f"({8 / t_split:.1f} clips/s)  "
          f"{'SPLIT WINS' if t_split < t_merged else 'MERGED WINS'} "
          f"{(t_merged - t_split) * 1e3:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""In-context A/B of the tap-GEMM PrimaryCaps kernels (ops/tapconv.py).

Times the FULL jitted train step at the bench configuration with the
Pallas tap-conv dispatch off vs on (and optionally across chunk sizes),
plus the three kernels standalone vs XLA's standalone conv directions.
This is the measurement that decides whether PICAD_TAPCONV=1 becomes
the default — standalone numbers are NOT sufficient (XLA's in-context
conv fusions run far below its standalone emitters; see README
Performance notes).

Usage (on a TPU-attached host):
    python tools/ab_tapconv.py              # off vs on at _CHUNK
    python tools/ab_tapconv.py 512 1280     # also sweep chunk sizes
    python tools/ab_tapconv.py --wpack      # + width-packed decoder convs
    python tools/ab_tapconv.py --em-remat   # + checkpointed EM routing
    python tools/ab_tapconv.py --bn-onepass # + one-pass BN batch stats
    python tools/ab_tapconv.py --bn-lanefold # + lane-folded stat reduces
    python tools/ab_tapconv.py --packed     # + packed uint8 input prep
    python tools/ab_tapconv.py --bn-pallas  # + Pallas BN-stats kernel
    python tools/ab_tapconv.py --no-tap ... # skip the tapconv-ON leg

Note: every leg pins ALL lever globals explicitly (the baseline leg
forces the two-pass BN form even though one-pass is the production
default), so each printed line is that lever alone vs the same
two-pass baseline regardless of env defaults.

One process, sequential measurements (two device processes serialize
through the tunneled attachment).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def step_time(enabled: bool, chunk: int | None = None, steps: int = 20,
              wpack: bool = False, em_remat: bool = False,
              bn_onepass: bool = False, bn_lanefold: bool = False,
              packed_prep: bool = False, bn_pallas: bool = False) -> float:
    import jax
    import jax.numpy as jnp

    import picad_tpu.models.layers as layers
    import picad_tpu.ops.bn_stats as bns
    import picad_tpu.ops.em_routing as em
    import picad_tpu.ops.tapconv as tc
    import picad_tpu.ops.wpack as wp
    import picad_tpu.train.step as step_mod

    tc._ENABLED = enabled
    wp._ENABLED = wpack
    em._REMAT = em_remat
    layers._BN_ONEPASS = bn_onepass
    layers._BN_LANEFOLD = bn_lanefold
    step_mod._PACKED_PREP = packed_prep
    bns._ENABLED = bn_pallas
    if chunk is not None:
        tc._CHUNK = chunk

    from picad_tpu.config import LossConfig
    from picad_tpu.models.capsules import CapsNet
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
    model = CapsNet(num_classes=24, compute_dtype=jnp.bfloat16, bn_groups=2)
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
    args = sys.argv[1:]
    do_wpack = "--wpack" in args
    do_em_remat = "--em-remat" in args
    do_bn_onepass = "--bn-onepass" in args
    do_bn_lanefold = "--bn-lanefold" in args
    do_packed = "--packed" in args
    do_bn_pallas = "--bn-pallas" in args
    chunks = [int(a) for a in args if not a.startswith("--")] or [None]
    if "--no-tap" in args:  # measure only the other levers vs baseline
        chunks = []
    t_off = step_time(False)
    print(f"tapconv OFF : {t_off * 1e3:8.2f} ms/step "
          f"({8 / t_off:.1f} clips/s)", flush=True)
    for c in chunks:
        t_on = step_time(True, c)
        tag = f"chunk {c}" if c else "default chunk"
        print(f"tapconv ON ({tag}): {t_on * 1e3:8.2f} ms/step "
              f"({8 / t_on:.1f} clips/s)  "
              f"{'WIN' if t_on < t_off else 'LOSS'} "
              f"{(t_off - t_on) * 1e3:+.2f} ms", flush=True)
    if do_wpack:
        t_wp = step_time(False, wpack=True)
        print(f"wpack ON (decoder convs): {t_wp * 1e3:8.2f} ms/step  "
              f"{'WIN' if t_wp < t_off else 'LOSS'} "
              f"{(t_off - t_wp) * 1e3:+.2f} ms", flush=True)
    if do_em_remat:
        t_em = step_time(False, em_remat=True)
        print(f"EM remat ON (checkpointed routing): {t_em * 1e3:8.2f} "
              f"ms/step  {'WIN' if t_em < t_off else 'LOSS'} "
              f"{(t_off - t_em) * 1e3:+.2f} ms", flush=True)
    if do_bn_onepass:
        t_bn = step_time(False, bn_onepass=True)
        print(f"BN one-pass stats ON: {t_bn * 1e3:8.2f} ms/step  "
              f"{'WIN' if t_bn < t_off else 'LOSS'} "
              f"{(t_off - t_bn) * 1e3:+.2f} ms", flush=True)
    if do_bn_lanefold:
        # Measured on top of the one-pass default (the production path);
        # compare against the --bn-onepass line for the incremental delta.
        t_lf = step_time(False, bn_onepass=True, bn_lanefold=True)
        print(f"BN one-pass + lane-fold ON: {t_lf * 1e3:8.2f} ms/step  "
              f"{'WIN' if t_lf < t_off else 'LOSS'} vs two-pass "
              f"{(t_off - t_lf) * 1e3:+.2f} ms", flush=True)
    if do_packed:
        # Measured on top of the one-pass BN default (the production path).
        t_pk = step_time(False, bn_onepass=True, packed_prep=True)
        print(f"packed uint8 prep ON: {t_pk * 1e3:8.2f} ms/step  "
              f"{'WIN' if t_pk < t_off else 'LOSS'} vs baseline "
              f"{(t_off - t_pk) * 1e3:+.2f} ms", flush=True)
    if do_bn_pallas:
        # Pallas stats replace the one-pass XLA reduce on the big BNs;
        # compare against the --bn-onepass line for the incremental delta.
        t_bp = step_time(False, bn_onepass=True, bn_pallas=True)
        print(f"Pallas BN stats ON (+one-pass elsewhere): {t_bp * 1e3:8.2f} "
              f"ms/step  {'WIN' if t_bp < t_off else 'LOSS'} vs two-pass "
              f"{(t_off - t_bp) * 1e3:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Capture a jax.profiler device trace of the train step and print the
top ops by total device time.

Parses the perfetto trace json (no TensorBoard needed): aggregates
XLA op durations on the device lanes, grouped by a cleaned op name.

Usage: python tools/trace_step.py [--bs 8] [--unfused] [--out /tmp/trace]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def capture(out_dir: str, bs: int, fused: bool):
    from picad_tpu.config import LossConfig
    from picad_tpu.models.capsules import CapsNet
    from picad_tpu.train.optimizer import make_optimizer
    from picad_tpu.train.state import create_train_state
    from picad_tpu.train.step import make_train_step

    H = 224
    model = CapsNet(
        num_classes=24, compute_dtype=jnp.bfloat16, bn_groups=2,
        fused_head=fused,
    )
    optimizer = make_optimizer(1e-4)
    state = create_train_state(
        model, optimizer, rng=jax.random.PRNGKey(47),
        sample_input_shape=(1, 8, H, H, 3),
    )
    step = jax.jit(
        make_train_step(
            model, optimizer,
            LossConfig(bv=True, n_frames=5, wt_cons=0.1, thresh_epoch=11),
            fold_flip=True,
        ),
        donate_argnums=(0,),
    )
    rng = np.random.default_rng(47)
    batch = {
        "data": rng.integers(0, 256, (bs, 8, H, H, 3), dtype=np.uint8),
        "loc_msk": (rng.random((bs, 8, H, H, 1)) > 0.7).astype(np.uint8),
        "action": rng.integers(0, 24, (bs,)).astype(np.int32),
        "label_vid": (np.arange(bs) % 2).astype(np.int32),
        "row_mask": np.ones((bs,), np.float32),
    }
    batch = jax.device_put(batch)
    epoch = jnp.asarray(12.0, jnp.float32)
    ramp = jnp.asarray(0.5, jnp.float32)
    for _ in range(3):  # warm
        state, m = step(state, batch, epoch, ramp)
    float(m["loss"])
    with jax.profiler.trace(out_dir):
        for _ in range(3):
            state, m = step(state, batch, epoch, ramp)
        float(m["loss"])


def clean_name(name: str, args: dict) -> str:
    # prefer the HLO source annotation when present
    for k in ("long_name", "tf_op", "hlo_op"):
        v = args.get(k)
        if v:
            return f"{name} [{str(v)[:90]}]"
    return name


def report(out_dir: str, top: int = 40):
    paths = glob.glob(
        os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True
    )
    assert paths, f"no trace under {out_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid names containing 'TPU'/'Device' — collect durations
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if any(k in n for k in ("TPU", "Device", "device", "/device"))
    }
    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        # skip program/region wrappers (jit_..., bare step numbers)
        if (
            name.startswith(("Steady", "run_", "Infeed", "program", "jit_"))
            or name.isdigit()
        ):
            continue
        dur = float(e.get("dur", 0.0))
        agg[clean_name(name, e.get("args", {}) or {})] += dur
        total += dur
    print(f"trace: {path}")
    print(f"total device-op time: {total / 1e3:.2f} ms (3 steps)")
    for name, dur in agg.most_common(top):
        print(f"  {dur / 1e3:9.2f} ms  {100 * dur / max(total, 1e-9):5.1f}%  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--unfused", action="store_true")
    ap.add_argument("--out", type=str, default="/tmp/picad_trace")
    ap.add_argument("--report_only", action="store_true")
    args = ap.parse_args()
    if not args.report_only:
        capture(args.out, args.bs, fused=not args.unfused)
    report(args.out)


if __name__ == "__main__":
    main()

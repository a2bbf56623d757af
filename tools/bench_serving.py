"""Serving-path throughput: clips/s through an exported artifact.

Measures the deployment-shaped loop — host clips in, sigmoid masks +
scores out (H2D, compute, D2H all included) — and, for reference, the
live jitted eval forward on the same shapes.  Run on a TPU-attached
host; numbers through the tunneled dev attachment are link-bound and
only comparable to each other.

Usage:
    python tools/bench_serving.py --artifact DIR [--steps 30]
    python tools/bench_serving.py --hw 224 --clip_bs 14   # template
        weights: builds a throwaway artifact first (no checkpoint needed)
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time_forward(fn, clips, steps: int) -> float:
    """clips/s over `steps` calls; completion forced by a value fetch
    (block_until_ready is unreliable through the tunnel)."""
    seg, _ = fn(clips)  # warm / compile
    float(np.asarray(seg).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        seg, scores = fn(clips)
        float(np.asarray(seg).ravel()[0])
    dt = time.perf_counter() - t0
    return steps * clips.shape[0] / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", type=str, default="")
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--clip_bs", type=int, default=14)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--compute_dtype", type=str, default="f32",
                    choices=("f32", "bf16"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from picad_tpu.eval.runner import make_padded_forward
    from picad_tpu.models.capsules import CapsNet
    from picad_tpu.serve import load_artifact, save_artifact
    from picad_tpu.train.optimizer import make_optimizer
    from picad_tpu.train.state import create_train_state

    dt = jnp.bfloat16 if args.compute_dtype == "bf16" else jnp.float32
    backend = jax.default_backend()

    if args.artifact:
        serving = load_artifact(args.artifact)
        hw, bs = serving.height, serving.clip_batch_size
        model = CapsNet(num_classes=serving.meta.get("num_classes") or 24,
                        compute_dtype=dt)
        variables = None  # no weights on hand; live compare skipped
    else:
        hw, bs = args.hw, args.clip_bs
        model = CapsNet(num_classes=24, compute_dtype=dt)
        state = create_train_state(
            model, make_optimizer(), rng=jax.random.PRNGKey(0)
        )
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        out = os.path.join(tempfile.mkdtemp(prefix="picad_srv_"), "art")
        print(f"exporting template artifact ({backend}, {hw}^2, bs={bs}, "
              f"{args.compute_dtype})...", flush=True)
        save_artifact(out, model, variables, clip_batch_size=bs,
                      height=hw, width=hw, platforms=(backend,))
        serving = load_artifact(out)

    clips = np.random.default_rng(0).random(
        (bs, 8, hw, hw, 3), dtype=np.float32
    )
    art = _time_forward(serving.predict_clips, clips, args.steps)
    print(f"artifact : {art:8.2f} clips/s  (bs={bs}, {hw}^2, {backend})",
          flush=True)
    if variables is not None:
        live = make_padded_forward(model, variables, clip_batch_size=bs)
        liv = _time_forward(live, clips, args.steps)
        print(f"live jit : {liv:8.2f} clips/s  "
              f"(artifact/live = {art / liv:.3f})", flush=True)


if __name__ == "__main__":
    main()

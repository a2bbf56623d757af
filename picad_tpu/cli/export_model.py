"""Export a trained checkpoint as a frozen serving artifact.

  python -m picad_tpu.cli.export_model --ckpt DIR/best_model_train_loss_N \
      --out /path/artifact [--hw 224] [--clip_batch_size 14] \
      [--platforms tpu,cpu] [--verify]

The artifact directory (model.stablehlo + meta.json) loads with
`picad_tpu.serve.load_artifact` and needs no checkpoint/training stack
at serving time.  `--verify` reloads the artifact and checks it against
the live eval forward on a random batch (requires a platform in
--platforms to be locally executable).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from picad_tpu.models.capsules import CapsNet
from picad_tpu.serve.export import load_artifact, save_artifact
from picad_tpu.train.optimizer import make_optimizer
from picad_tpu.train.state import create_train_state


def main(argv=None):
    p = argparse.ArgumentParser(description="serving export")
    p.add_argument("--ckpt", type=str, required=True,
                   help="one checkpoint directory (not a sweep root)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--hw", type=int, default=224,
                   help="spatial eval resolution (reference: 224)")
    p.add_argument("--clip_batch_size", type=int, default=14)
    p.add_argument("--num_classes", type=int, default=24)
    p.add_argument("--platforms", type=str, default="tpu",
                   help="comma list, e.g. tpu,cpu")
    p.add_argument("--compute_dtype", type=str, default="f32",
                   choices=("f32", "bf16"),
                   help="artifact compute dtype: bf16 halves serving HBM "
                   "traffic and doubles MXU rate (weights stay f32 "
                   "constants; matmul/conv inputs cast, f32 accumulation "
                   "— the training path's production precision)")
    p.add_argument("--seed", type=int, default=47)
    p.add_argument("--verify", action="store_true",
                   help="reload the artifact and compare one random "
                   "batch against the live eval forward")
    args = p.parse_args(argv)

    from picad_tpu.checkpoint.manager import CheckpointIO

    import jax.numpy as jnp

    dt = jnp.bfloat16 if args.compute_dtype == "bf16" else jnp.float32
    model = CapsNet(num_classes=args.num_classes, compute_dtype=dt)
    # the param pytree is dtype-independent: restore against an f32
    # template (checkpoints are stored f32)
    template = create_train_state(
        CapsNet(num_classes=args.num_classes),
        make_optimizer(),
        rng=jax.random.PRNGKey(args.seed),
    )
    state = CheckpointIO().restore(args.ckpt, template)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    platforms = [s.strip() for s in args.platforms.split(",") if s.strip()]
    out = save_artifact(
        args.out,
        model,
        variables,
        clip_batch_size=args.clip_batch_size,
        height=args.hw,
        width=args.hw,
        platforms=platforms,
        num_classes=args.num_classes,
        extra_meta={
            "source_checkpoint": args.ckpt,
            "compute_dtype": args.compute_dtype,
        },
    )
    print(f"Exported {args.ckpt} -> {out} (platforms={platforms})")

    if args.verify:
        from picad_tpu.eval.runner import make_padded_forward
        from picad_tpu.ops.fused_head import pallas_disabled

        serving = load_artifact(out)
        rng = np.random.default_rng(0)
        clips = rng.random(
            (3, 8, args.hw, args.hw, 3), dtype=np.float32
        )
        seg_a, sc_a = serving.predict_clips(clips)
        # trace the live forward through the same pure-XLA chain the
        # artifact was traced through (at bf16 on a TPU host the live
        # path would otherwise dispatch the Pallas head — numerically
        # close but not identical)
        with pallas_disabled():
            live = make_padded_forward(
                model, variables, clip_batch_size=args.clip_batch_size
            )
            seg_b, sc_b = live(clips)
        np.testing.assert_allclose(seg_a, seg_b, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(sc_a, sc_b, rtol=1e-4, atol=1e-5)
        print("Verified: artifact matches the live eval forward.")


if __name__ == "__main__":
    main()

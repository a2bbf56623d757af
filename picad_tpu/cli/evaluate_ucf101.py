"""UCF101-24 evaluation CLI (evaluate_ucf101.py equivalent).

  python -m picad_tpu.cli.evaluate_ucf101 --ckpt DIR \
      --data_root /data/ucf101 --annotation_root /data/pkls
"""

from __future__ import annotations

import argparse
import os

import jax

from picad_tpu.data.dataset import EvalVideoDataset
from picad_tpu.data.sources import SyntheticVideoSource, UCFVideoSource
from picad_tpu.eval.runner import sweep_checkpoints
from picad_tpu.models.capsules import CapsNet
from picad_tpu.train.optimizer import make_optimizer
from picad_tpu.train.state import create_train_state


def main(argv=None):
    p = argparse.ArgumentParser(description="evaluation")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--seed", type=int, default=47)
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--data_root", type=str, default="")
    p.add_argument("--annotation_root", type=str, default="")
    p.add_argument(
        "--test_file", type=str, default="testing_annots.pkl",
        help="eval annotation pickle (the reference EVAL loader reads "
        "testing_annots.pkl, ucf_dataloader_eval.py; the near-identically "
        "named test_annots.pkl is the TRAIN-val split, main_ucf101.py:347)",
    )
    p.add_argument("--clip_batch_size", type=int, default=14)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--no_prune", action="store_true")
    p.add_argument(
        "--decoder", type=str, default="cv2", choices=("cv2", "skvideo"),
        help="video decode stack: 'skvideo' reproduces the reference's "
        "skvideo.io.vread/ffmpeg path (ucf_dataloader_eval.py:116; needs "
        "the optional scikit-video package), 'cv2' is the built-in "
        "OpenCV path (pixels usually identical, not provably so)",
    )
    p.add_argument(
        "--nan_safe", action="store_true",
        help="mean over present classes only (reference np.mean propagates "
        "NaN when a class has no test videos, evaluate_ucf101.py:184-187)",
    )
    p.add_argument(
        "--eval_dp", type=int, default=0,
        help="shard clip batches over N devices (0/1 = single device; "
        "clip_batch_size must divide by N; eval mode has no cross-sample "
        "reductions, so results are identical at any N)",
    )
    args = p.parse_args(argv)

    model = CapsNet(num_classes=24)
    template = create_train_state(
        model, make_optimizer(), rng=jax.random.PRNGKey(args.seed)
    )
    if args.synthetic:
        source = SyntheticVideoSource(8, num_classes=24, seed=args.seed)
    else:
        # The per-video single-annotation choice is drawn from the legacy
        # MT19937 stream seeded by --seed in dataset order — the exact
        # draws of np.random.seed(47) (evaluate_ucf101.py:36) +
        # np.random.randint (ucf_dataloader_eval.py:135-137) with
        # num_workers=0 (see PARITY.md for the num_workers>0 caveat).
        source = UCFVideoSource(
            os.path.join(args.annotation_root, args.test_file),
            args.data_root,
            single_annotation=True,
            annotation_seed=args.seed,
            decoder=args.decoder,
        )
    dataset = EvalVideoDataset(source)
    sweep_checkpoints(
        model,
        template,
        args.ckpt,
        dataset,
        split=args.split,
        n_classes=24,
        clip_batch_size=args.clip_batch_size,
        prune=not args.no_prune,
        nan_safe=args.nan_safe,
        eval_devices=args.eval_dp,
    )


if __name__ == "__main__":
    main()

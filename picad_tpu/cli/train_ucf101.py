"""UCF101-24 semi-supervised training driver.

Usage mirrors the reference (README.md:9-17):

  python -m picad_tpu.cli.train_ucf101 --epochs 100 --bs 8 --loc_loss dice \
      --lr 1e-4 --wt_loc 1 --wt_cls 1 --wt_cons 0.1 --const_loss l2 \
      --bv --n_frames 5 --thresh_epoch 11 \
      --data_root /data/ucf101 --annotation_root /data/pkls

Replaces main_ucf101.py:321-456.
"""

from __future__ import annotations

from picad_tpu.cli.common import (
    args_to_config,
    build_parser,
    build_train_datasets,
    maybe_initialize_distributed,
)
from picad_tpu.train.loop import Trainer


def main(argv=None):
    args = build_parser("ucf101").parse_args(argv)
    print(vars(args))
    maybe_initialize_distributed(args)
    cfg = args_to_config(args, "ucf101")
    labeled, unlabeled, val = build_train_datasets(cfg)
    print(len(labeled), len(unlabeled), len(val))
    trainer = Trainer(
        cfg,
        labeled_dataset=labeled,
        unlabeled_dataset=unlabeled,
        val_dataset=val,
        use_wandb=args.wandb,
        watch=args.watch,
    )
    start_epoch = trainer.restore(args.resume) if args.resume else 1
    trainer.fit(start_epoch)


if __name__ == "__main__":
    main()

"""JHMDB-21 semi-supervised training driver (main_jhmdb.py equivalent).

The reference JHMDB driver imports modules missing from its repo
(main_jhmdb.py:338,369); this is the working reconstruction: same loop
with num_classes=21, txt video lists, puppet masks, per-stream
labeled/unlabeled flags, and wandb logging gated behind --wandb.
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
    args = build_parser("jhmdb").parse_args(argv)
    print(vars(args))
    maybe_initialize_distributed(args)
    cfg = args_to_config(args, "jhmdb")
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

"""Scalar metric logging: stdout + JSONL + (optional) TensorBoard.

The reference logs scalars through tensorboardX every `--pf` batches
(main_ucf101.py:202-214) and wandb on JHMDB (main_jhmdb.py:204-210).
Here a single MetricLogger fans out to stdout, an append-only JSONL file
(machine-readable run history), and TensorBoard when available
(torch.utils.tensorboard in this image); wandb is gated the same way.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping


class MetricLogger:
    def __init__(self, log_dir: str, *, use_tensorboard: bool = True, use_wandb: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
            except Exception:
                self._wandb = None

    def log(self, tag: str, scalars: Mapping[str, float], step: int) -> None:
        record = {"tag": tag, "step": step, "time": time.time(), **{
            k: float(v) for k, v in scalars.items()
        }}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalars(tag, {k: float(v) for k, v in scalars.items()}, step)
        if self._wandb is not None:
            self._wandb.log({f"{tag}/{k}": float(v) for k, v in scalars.items()})

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()

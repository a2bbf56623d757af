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
    def __init__(
        self,
        log_dir: str,
        *,
        use_tensorboard: bool = True,
        use_wandb: bool = False,
        run_name: str | None = None,
        wandb_project: str = "picad_tpu",
    ):
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

                # Derived run name like the reference's wandb bring-up
                # (main_jhmdb.py:413-422: wandb.init + run.name = exp id).
                wandb.init(
                    project=wandb_project,
                    name=run_name or os.path.basename(log_dir.rstrip("/")),
                    dir=log_dir,
                )
                self._wandb = wandb
            except Exception:
                self._wandb = None

    def watch_params(self, params, step: int, prefix: str = "params") -> None:
        """Parameter/gradient magnitude histogramming — the functional
        equivalent of the reference's `wandb.watch(model)`
        (main_jhmdb.py:422), which hooks torch modules and has no meaning
        for jax pytrees.  Call with params (or grads) every pf steps;
        logs per-leaf L2 norms to every sink."""
        import numpy as np

        flat = _flatten(params, prefix)
        norms = {k: float(np.linalg.norm(np.asarray(v))) for k, v in flat.items()}
        self.log(f"{prefix}_norms", norms, step)

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
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass


def _flatten(tree, prefix: str) -> dict:
    """Nested mapping pytree -> {dotted/path: leaf} (params/grads)."""
    out = {}

    def rec(node, path):
        if isinstance(node, Mapping):
            for k, v in node.items():
                rec(v, f"{path}/{k}")
        else:
            out[path] = node

    rec(tree, prefix)
    return out

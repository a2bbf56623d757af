"""Native checkpoints (Orbax) + the reference's best-loss retention policy.

The reference saves a bare state_dict whenever train/val loss improves and
deletes the previously-best file only while epoch < 20
(main_ucf101.py:439-455); no optimizer state is saved and no resume
exists.  We keep that policy for drop-in familiarity but checkpoint the
*full* train state — params, batch stats, optimizer state, epoch, and
the COMPLETE ReduceLROnPlateau state: the live LR (inside opt_state via
inject_hyperparams) plus the best/num_bad_epochs/cooldown counters
mirrored into TrainState.sched_* (train/state.py) — which adds real
checkpoint/resume capability: a resumed run reduces the LR at the same
epoch an unbroken run would.
"""

from __future__ import annotations

import os
import shutil
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointIO:
    """Thin Orbax wrapper for whole-train-state checkpoints.

    Multi-process: orbax's save is a COLLECTIVE — StandardCheckpointer
    runs its own sync_global_processes barriers internally, so every
    process must call save() (a process-0-only call mismatches the
    barrier and aborts the run; caught by
    tests/test_multihost.py::test_two_process_ckpt_save_restore).
    Orbax itself makes sure only the owning processes touch the
    filesystem; the pre-save cleanup here is process-0-gated with a
    barrier so the rmtree cannot race another process's save.
    """

    def __init__(self):
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, path: str, state: Any) -> None:
        path = os.path.abspath(path)
        if jax.process_index() == 0 and os.path.exists(path):
            shutil.rmtree(path)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"picad-ckpt-clean:{path}")
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()

    def restore(self, path: str, template: Any) -> Any:
        return self._ckptr.restore(os.path.abspath(path), template)


class BestCheckpointPolicy:
    """best-val / best-train retention matching main_ucf101.py:429-455."""

    def __init__(self, save_dir: str, tag: str, keep_all_after_epoch: int = 20):
        self.save_dir = save_dir
        self.tag = tag  # 'val' or 'train'
        self.keep_all_after_epoch = keep_all_after_epoch
        self.best_loss = float("inf")
        self.prev_path: str | None = None
        self.io = CheckpointIO()

    def maybe_save(self, epoch: int, loss: float, state: Any) -> str | None:
        if loss >= self.best_loss:
            return None
        self.best_loss = loss
        path = os.path.join(
            self.save_dir, f"best_model_{self.tag}_loss_{epoch}"
        )
        # Multi-host: losses are identical on every process (the step
        # reduces over the GLOBAL batch), so the policy's decisions stay
        # in lockstep, and EVERY process calls the collective orbax save
        # (see CheckpointIO.save — orbax coordinates who writes).  Only
        # process 0 performs the retention delete of the previous best.
        self.io.save(path, state)
        if jax.process_index() == 0:
            if self.prev_path and epoch < self.keep_all_after_epoch:
                shutil.rmtree(self.prev_path, ignore_errors=True)
        self.prev_path = path
        return path

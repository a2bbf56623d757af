"""Checkpoint-sweep evaluation runner (evaluate_ucf101.py equivalent).

For every saved checkpoint matching `best_model_<split>*` in a directory:
restore, run the full-video protocol (eval.engine) over the test set,
print accuracy / f-mAP / v-mAP at 0.2 and 0.5, then keep only the
best-fmAP and best-vmAP checkpoints (evaluate_ucf101.py:194-203).

The model forward is jitted once on a fixed (clip_batch_size, 8, H, W, 3)
shape; partial batches are zero-padded and the padding rows dropped on
the host — XLA compiles a single program for the whole sweep (the
reference re-dispatches per ragged batch).
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from picad_tpu.eval.engine import evaluate_dataset


def make_eval_fn(model, mesh=None):
    """The jitted eval forward, built ONCE per model.

    Params/stats are arguments, so a checkpoint sweep swaps weights
    without retracing — one XLA program for the whole sweep (tracing a
    full CapsNet costs minutes on slow hosts; the round-2 sweep paid it
    per checkpoint).

    Matches the reference eval call signature: dummy action 500, eval-mode
    class masking by predicted argmax (evaluate_ucf101.py:123-128),
    sigmoid applied to seg logits.

    With `mesh` (a 1-D data mesh, parallel/mesh.create_mesh) the clip
    batch is sharded over the devices and params/stats replicated — eval
    mode has no cross-sample reduction (BN runs on running stats,
    dropout off), so the sharded forward is exactly the single-device
    one, N clips at a time.  The reference protocol is single-GPU
    (evaluate_ucf101.py); this is the scale-out the sweep needs on a
    pod slice.
    """

    def fwd(params, batch_stats, clips):
        b = clips.shape[0]
        dummy = jnp.full((b,), 500, jnp.int32)
        seg, scores, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            clips,
            dummy,
            jnp.zeros((b,), jnp.float32),
            0,
            0,
            False,
        )
        return jax.nn.sigmoid(seg), scores

    if mesh is None:
        return jax.jit(fwd)

    from picad_tpu.parallel.mesh import batch_sharding, replicated_sharding

    shard = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    return jax.jit(
        fwd,
        in_shardings=(repl, repl, shard),
        out_shardings=(shard, shard),
    )


def _mesh_or_none(eval_devices: int):
    """Build the eval data mesh for --eval_dp N (0/1 = single device)."""
    if eval_devices in (0, 1):
        return None
    from picad_tpu.parallel.mesh import create_mesh

    n = len(jax.devices())
    if eval_devices > n:
        raise ValueError(
            f"--eval_dp {eval_devices} > {n} visible devices"
        )
    return create_mesh(eval_devices)


def make_padded_forward(
    model, variables, *, clip_batch_size: int = 14, eval_fn=None,
    mesh=None,
) -> Callable[[np.ndarray], tuple[np.ndarray, np.ndarray]]:
    """Bind weights to the (shared) jitted eval forward; pad ragged clip
    batches to the compiled shape and drop the padding rows on the host.

    Pass `eval_fn=make_eval_fn(model)` when calling repeatedly (e.g. the
    checkpoint sweep) so every binding reuses one traced program."""
    fwd = eval_fn if eval_fn is not None else make_eval_fn(model, mesh)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if mesh is not None:
        if clip_batch_size % mesh.size != 0:
            raise ValueError(
                f"clip_batch_size {clip_batch_size} must divide evenly "
                f"over the {mesh.size}-device eval mesh"
            )
        from picad_tpu.parallel.mesh import replicated_sharding

        # replicate the weights ONCE per binding — host numpy params
        # would otherwise re-transfer on every padded batch
        repl = replicated_sharding(mesh)
        params = jax.device_put(params, repl)
        stats = jax.device_put(stats, repl)

    def forward(clips: np.ndarray):
        n = clips.shape[0]
        if n < clip_batch_size:
            pad = np.zeros(
                (clip_batch_size - n, *clips.shape[1:]), dtype=clips.dtype
            )
            clips = np.concatenate([clips, pad], axis=0)
        seg, scores = fwd(params, stats, jnp.asarray(clips))
        return np.asarray(seg)[:n], np.asarray(scores)[:n]

    return forward


def sweep_checkpoints(
    model,
    template_state,
    ckpt_dir: str,
    dataset,
    *,
    split: str = "train",
    n_classes: int = 24,
    clip_batch_size: int = 14,
    prune: bool = True,
    log_predictions: bool = False,
    nan_safe: bool = False,
    eval_devices: int = 0,
) -> dict:
    """Evaluate every matching checkpoint; prune to the two best.

    log_predictions writes correct_pred.txt / incorrect_pred.txt with
    per-video outcomes — the working version of the reference's dead
    logging code (evaluate_jhmdb.py:144-147 writes to never-opened
    handles)."""
    from picad_tpu.checkpoint.manager import CheckpointIO

    io = CheckpointIO()
    paths = sorted(glob.glob(os.path.join(ckpt_dir, f"best_model_{split}*")))
    if not paths:
        print(
            f"No checkpoints matching 'best_model_{split}*' in {ckpt_dir!r} — "
            "nothing to evaluate."
        )
        return {}
    results = {}
    fmap_best, vmap_best, names = [], [], []
    mesh = _mesh_or_none(eval_devices)
    eval_fn = make_eval_fn(model, mesh)  # trace/compile once for the sweep
    for path in paths:
        state = io.restore(path, template_state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        forward = make_padded_forward(
            model, variables, clip_batch_size=clip_batch_size,
            eval_fn=eval_fn, mesh=mesh,
        )
        pred_log = [] if log_predictions else None
        summary = evaluate_dataset(
            forward, dataset, n_classes=n_classes,
            clip_batch_size=clip_batch_size, verbose=True,
            prediction_log=pred_log, nan_safe=nan_safe,
        )
        if pred_log is not None:
            tag = os.path.basename(path)
            for fname, want in (
                ("correct_pred", True), ("incorrect_pred", False)
            ):
                with open(
                    os.path.join(ckpt_dir, f"{fname}_{tag}.txt"), "w"
                ) as f:
                    for rec in pred_log:
                        if rec["correct"] == want:
                            f.write(
                                f"{rec['video']} label={rec['label']} "
                                f"pred={rec['pred']}\n"
                            )
        results[path] = summary
        names.append(path)
        fmap_best.append(summary["fmAP@0.5"])
        vmap_best.append(summary["vmAP@0.5"])

    if prune and names:
        keep = {
            names[int(np.argmax(fmap_best))],
            names[int(np.argmax(vmap_best))],
        }
        for path in names:
            if path not in keep:
                shutil.rmtree(path, ignore_errors=True)
        print(os.listdir(ckpt_dir))
    return results

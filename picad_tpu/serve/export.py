"""AOT export of the eval forward as a portable serving artifact.

The reference repo ends at research evaluation (evaluate_ucf101.py); a
production deployment additionally needs a frozen, versioned inference
artifact that can be loaded without the training stack, model source, or
checkpoint machinery.  This module provides that as a thin layer over
`jax.export`: the eval-mode forward (same call contract as
eval/runner.py:make_eval_fn — dummy action 500, eval-mode class masking
by predicted argmax, sigmoid on the seg logits) is traced ONCE at a
fixed clip-batch shape with the weights baked in as constants, lowered
to StableHLO for an explicit platform list, and serialized next to a
JSON metadata sidecar.

Portability rule: artifacts are always traced through the pure-XLA
compute chain (`ops.fused_head.pallas_disabled`, Pallas/Mosaic
custom-calls pinned off) — a baked Mosaic custom-call would tie the
artifact to one TPU compiler version, defeating the point of an AOT
format.  The XLA chain is oracle-tested equal to the kernels; the
kernels remain a jit-time perf fast path for training.

Artifact layout (a directory):
    model.stablehlo   jax.export serialized bytes (weights as constants)
    meta.json         shapes, platforms, num_classes, format version
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp

_FORMAT_VERSION = 1
_ARTIFACT_BIN = "model.stablehlo"
_ARTIFACT_META = "meta.json"


def _pure_xla_trace():
    """Context pinning every staged kernel gate off for the trace."""
    import contextlib

    from picad_tpu.ops import fused_head, tapconv, wpack

    @contextlib.contextmanager
    def ctx():
        prev_tc, prev_wp = tapconv._ENABLED, wpack._ENABLED
        tapconv._ENABLED = wpack._ENABLED = False
        try:
            with fused_head.pallas_disabled():
                yield
        finally:
            tapconv._ENABLED, wpack._ENABLED = prev_tc, prev_wp

    return ctx()


def export_eval_forward(
    model,
    variables: Mapping[str, Any],
    *,
    clip_batch_size: int,
    height: int,
    width: int,
    depth: int = 8,
    platforms: Sequence[str] = ("tpu",),
):
    """Trace + lower the eval forward for `platforms`; returns the
    jax.export Exported object (serialize with .serialize()).

    Weights are closed over, so the exported callable takes ONLY a
    (clip_batch_size, depth, height, width, 3) f32 clip batch and
    returns (sigmoid_seg, class_scores) — the exact contract of
    eval/runner.py:make_padded_forward's inner call.
    """
    from jax import export as jax_export

    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def fwd(clips):
        b = clips.shape[0]
        dummy = jnp.full((b,), 500, jnp.int32)
        seg, scores, _ = model.apply(
            {"params": params, "batch_stats": stats},
            clips,
            dummy,
            jnp.zeros((b,), jnp.float32),
            0,
            0,
            False,
        )
        return jax.nn.sigmoid(seg), scores

    spec = jax.ShapeDtypeStruct(
        (clip_batch_size, depth, height, width, 3), jnp.float32
    )
    with _pure_xla_trace():
        return jax_export.export(
            jax.jit(fwd), platforms=tuple(platforms)
        )(spec)


def save_artifact(
    out_dir: str,
    model,
    variables: Mapping[str, Any],
    *,
    clip_batch_size: int,
    height: int,
    width: int,
    depth: int = 8,
    platforms: Sequence[str] = ("tpu",),
    num_classes: int | None = None,
    extra_meta: Mapping[str, Any] | None = None,
) -> str:
    """Export + write the artifact directory; returns its path."""
    exp = export_eval_forward(
        model,
        variables,
        clip_batch_size=clip_batch_size,
        height=height,
        width=width,
        depth=depth,
        platforms=platforms,
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _ARTIFACT_BIN), "wb") as f:
        f.write(exp.serialize())
    meta = {
        "format_version": _FORMAT_VERSION,
        "clip_batch_size": clip_batch_size,
        "depth": depth,
        "height": height,
        "width": width,
        "platforms": list(platforms),
        "num_classes": (
            num_classes
            if num_classes is not None
            else getattr(model, "num_classes", None)
        ),
    }
    if extra_meta:
        meta.update(dict(extra_meta))
    with open(os.path.join(out_dir, _ARTIFACT_META), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    return out_dir


def load_artifact(artifact_dir: str):
    """Load an artifact directory -> ServingModel (see serve/runner.py)."""
    from jax import export as jax_export

    from picad_tpu.serve.runner import ServingModel

    with open(os.path.join(artifact_dir, _ARTIFACT_META)) as f:
        meta = json.load(f)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"artifact format {meta.get('format_version')!r} != supported "
            f"{_FORMAT_VERSION} ({artifact_dir})"
        )
    with open(os.path.join(artifact_dir, _ARTIFACT_BIN), "rb") as f:
        exp = jax_export.deserialize(f.read())
    return ServingModel(jax.jit(exp.call), meta)

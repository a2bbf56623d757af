"""PyTorch state_dict -> flax variables converter.

Supports two sources:
- the I3D backbone `rgb_charades.pt` (piergiaj/pytorch-i3d format, loaded
  by the reference via name-intersection, models/capsules_ucf101.py:344-353);
- full reference CapsNet `.pth` checkpoints (same module naming as
  models/capsules_ucf101.py), enabling numeric-parity evaluation on
  identical weights.

Layout transforms (torch -> channels-last JAX):
- Conv3d weight (O, I, D, H, W) -> (D, H, W, I, O)
- Conv2d weight (O, I, H, W) -> (H, W, I, O)
- ConvTransposeNd weight (I, O, *k) -> (*k, I, O); our conv_transpose_nd
  flips the kernel spatially at call time, so the storage orientation here
  is plain (spatial..., Cin, Cout).
- BatchNorm weight/bias -> scale/bias params; running_mean/var ->
  batch_stats.
- ConvCaps weights (1, B, C, P, P) -> (B, C, P, P).

Missing keys are skipped (the reference loads with strict=False /
name-intersection); the return includes a count of loaded tensors.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

_I3D_ENDPOINT_CONVS = (
    "Conv3d_1a_7x7",
    "Conv3d_2b_1x1",
    "Conv3d_2c_3x3",
)
_I3D_MIXED = (
    "Mixed_3b",
    "Mixed_3c",
    "Mixed_4b",
    "Mixed_4c",
    "Mixed_4d",
    "Mixed_4e",
    "Mixed_4f",
    "Mixed_5b",
    "Mixed_5c",
)
_BRANCHES = ("b0", "b1a", "b1b", "b2a", "b2b", "b3b")


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint to numpy without needing CUDA."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _conv3d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _conv2d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convt3d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 0, 1)))


def _convt2d(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _unit3d_entries(torch_prefix: str, jax_path: tuple[str, ...]):
    """(torch_key, kind, params_path_or_stats_path) rows for one Unit3D."""
    return [
        (f"{torch_prefix}.conv3d.weight", "conv3d", ("params", *jax_path, "kernel")),
        (f"{torch_prefix}.conv3d.bias", "vec", ("params", *jax_path, "bias")),
        (f"{torch_prefix}.bn.weight", "vec", ("params", *jax_path, "bn", "scale")),
        (f"{torch_prefix}.bn.bias", "vec", ("params", *jax_path, "bn", "bias")),
        (
            f"{torch_prefix}.bn.running_mean",
            "vec",
            ("batch_stats", *jax_path, "bn", "mean"),
        ),
        (
            f"{torch_prefix}.bn.running_var",
            "vec",
            ("batch_stats", *jax_path, "bn", "var"),
        ),
    ]


def _i3d_mapping(prefix: str = ""):
    rows = []
    for ep in _I3D_ENDPOINT_CONVS:
        rows += _unit3d_entries(f"{prefix}{ep}", ("conv1", ep))
    for ep in _I3D_MIXED:
        for br in _BRANCHES:
            rows += _unit3d_entries(f"{prefix}{ep}.{br}", ("conv1", ep, br))
    return rows


def _capsnet_mapping():
    rows = _i3d_mapping(prefix="conv1.")
    rows += [
        ("primary_caps.pose.weight", "conv2d", ("params", "primary_caps", "pose_kernel")),
        ("primary_caps.pose.bias", "vec", ("params", "primary_caps", "pose_bias")),
        ("primary_caps.a.weight", "conv2d", ("params", "primary_caps", "a_kernel")),
        ("primary_caps.a.bias", "vec", ("params", "primary_caps", "a_bias")),
        ("conv_caps.beta_u", "vec", ("params", "conv_caps", "beta_u")),
        ("conv_caps.beta_a", "vec", ("params", "conv_caps", "beta_a")),
        ("conv_caps.weights", "caps_w", ("params", "conv_caps", "weights")),
        ("upsample1.weight", "convt2d", ("params", "upsample1_kernel")),
        ("upsample1.bias", "vec", ("params", "upsample1_bias")),
        ("upsample2.weight", "convt3d", ("params", "upsample2_kernel")),
        ("upsample2.bias", "vec", ("params", "upsample2_bias")),
        ("upsample3.weight", "convt3d", ("params", "upsample3_kernel")),
        ("upsample3.bias", "vec", ("params", "upsample3_bias")),
        ("upsample4.weight", "convt3d", ("params", "upsample4_kernel")),
        ("upsample4.bias", "vec", ("params", "upsample4_bias")),
        ("smooth.weight", "convt3d", ("params", "smooth_kernel")),
        ("smooth.bias", "vec", ("params", "smooth_bias")),
        ("conv28.weight", "conv2d", ("params", "conv28_kernel")),
        ("conv28.bias", "vec", ("params", "conv28_bias")),
        ("conv56.weight", "conv3d", ("params", "conv56_kernel")),
        ("conv56.bias", "vec", ("params", "conv56_bias")),
        ("conv112.weight", "conv3d", ("params", "conv112_kernel")),
        ("conv112.bias", "vec", ("params", "conv112_bias")),
    ]
    return rows


_KIND_FN = {
    "conv3d": _conv3d,
    "conv2d": _conv2d,
    "convt3d": _convt3d,
    "convt2d": _convt2d,
    "vec": lambda w: np.asarray(w),
    "caps_w": lambda w: np.asarray(w)[0],  # (1, B, C, P, P) -> (B, C, P, P)
}


def _apply_mapping(
    state_dict: Mapping[str, np.ndarray], rows
) -> tuple[dict, dict, int]:
    params: dict = {}
    stats: dict = {}
    loaded = 0
    for torch_key, kind, path in rows:
        if torch_key not in state_dict:
            continue
        value = _KIND_FN[kind](np.asarray(state_dict[torch_key])).astype(np.float32)
        target = params if path[0] == "params" else stats
        _set(target, path[1:], value)
        loaded += 1
    return params, stats, loaded


def convert_i3d_backbone(
    state_dict: Mapping[str, np.ndarray],
) -> tuple[dict, dict, int]:
    """Convert an rgb_charades.pt-style I3D state dict.

    Returns (params, batch_stats, n_loaded) with subtrees rooted at
    'conv1', mirroring the reference's name-intersection partial load.
    """
    return _apply_mapping(state_dict, _i3d_mapping())


def convert_capsnet_state_dict(
    state_dict: Mapping[str, np.ndarray],
) -> tuple[dict, dict, int]:
    """Convert a full reference CapsNet .pth state dict."""
    return _apply_mapping(state_dict, _capsnet_mapping())


def merge_into_variables(variables: Mapping[str, Any], params: dict, stats: dict):
    """Overlay converted tensors onto freshly-initialized flax variables.

    Leaves not present in (params, stats) keep their initialized values —
    the strict=False semantics of the reference loader
    (models/capsules_ucf101.py:393-396).
    """
    import jax

    def overlay(init_tree, new_tree):
        if not isinstance(init_tree, Mapping):
            return init_tree
        out = dict(init_tree)
        for k, v in new_tree.items():
            if k in out and isinstance(out[k], Mapping):
                out[k] = overlay(out[k], v)
            elif k in out:
                expected = out[k]
                assert expected.shape == v.shape, (k, expected.shape, v.shape)
                out[k] = jax.numpy.asarray(v, dtype=expected.dtype)
            else:
                raise KeyError(f"converted key {k} not found in model variables")
        return out

    new_vars = dict(variables)
    new_vars["params"] = overlay(variables["params"], params)
    if stats:
        new_vars["batch_stats"] = overlay(variables.get("batch_stats", {}), stats)
    return new_vars

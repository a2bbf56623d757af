"""Independent torch-CPU oracle of the full reference model (eval mode).

A functional torch implementation of the documented forward semantics
(models/pytorch_i3d.py, models/capsules_ucf101.py) operating directly on
a reference-format state_dict.  Used to golden-check the JAX model +
checkpoint converter end-to-end on identical weights and inputs.

This is test-only code, written independently in functional style (no
nn.Module graph); EM routing reuses the loop oracle from
tests/test_em_routing.py.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from tests.sd_fixtures import MIXED_SPECS
from tests.test_em_routing import oracle as em_oracle


def _same_pad(x, kernel, stride):
    dims = x.shape[2:]
    flat = []
    for size, k, s in zip(reversed(dims), reversed(kernel), reversed(stride)):
        pad = max(k - s, 0) if size % s == 0 else max(k - (size % s), 0)
        flat += [pad // 2, pad - pad // 2]
    return F.pad(x, flat)


def _unit3d(x, sd, prefix, stride=(1, 1, 1)):
    w = torch.from_numpy(sd[f"{prefix}.conv3d.weight"])
    x = _same_pad(x, w.shape[2:], stride)
    x = F.conv3d(x, w, stride=stride)
    x = F.batch_norm(
        x,
        torch.from_numpy(sd[f"{prefix}.bn.running_mean"]),
        torch.from_numpy(sd[f"{prefix}.bn.running_var"]),
        torch.from_numpy(sd[f"{prefix}.bn.weight"]),
        torch.from_numpy(sd[f"{prefix}.bn.bias"]),
        training=False,
        eps=1e-3,
    )
    return F.relu(x)


def _maxpool_same(x, kernel, stride):
    return F.max_pool3d(_same_pad(x, kernel, stride), kernel, stride)


def _inception(x, sd, prefix):
    b0 = _unit3d(x, sd, f"{prefix}.b0")
    b1 = _unit3d(_unit3d(x, sd, f"{prefix}.b1a"), sd, f"{prefix}.b1b")
    b2 = _unit3d(_unit3d(x, sd, f"{prefix}.b2a"), sd, f"{prefix}.b2b")
    b3 = _unit3d(_maxpool_same(x, (3, 3, 3), (1, 1, 1)), sd, f"{prefix}.b3b")
    return torch.cat([b0, b1, b2, b3], dim=1)


def i3d_forward(x, sd, prefix="conv1."):
    """x: (B, 3, T, H, W) -> (mixed4f, out56, out112)."""
    x = _unit3d(x, sd, f"{prefix}Conv3d_1a_7x7", stride=(2, 2, 2))
    out112 = x
    x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
    x = _unit3d(x, sd, f"{prefix}Conv3d_2b_1x1")
    x = _unit3d(x, sd, f"{prefix}Conv3d_2c_3x3", stride=(2, 1, 1))
    out56 = x
    x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
    x = _inception(x, sd, f"{prefix}Mixed_3b")
    x = _inception(x, sd, f"{prefix}Mixed_3c")
    x = _maxpool_same(x, (3, 3, 3), (2, 1, 1))
    for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = _inception(x, sd, f"{prefix}{name}")
    return x, out56, out112


def capsnet_forward(img_np, sd, num_classes=24, P=4):
    """Eval-mode forward.  img_np: (B, 3, 8, H, W) f32.

    Returns (seg_logits (B, 1, 8, H, W), class_scores (B, C)) as numpy.
    """
    x = torch.from_numpy(img_np)
    psize = P * P
    C = num_classes

    feat, cross56, cross112 = i3d_forward(x, sd)
    B = feat.shape[0]
    h28 = feat.shape[3]
    feat2d = feat.reshape(B, 832, h28, h28)  # T = 1 at Mixed_4f
    cross28 = feat2d.clone()

    # PrimaryCaps: two 9x9 VALID convs, activation sigmoid, channel-last cat
    pose = F.conv2d(
        feat2d,
        torch.from_numpy(sd["primary_caps.pose.weight"]),
        torch.from_numpy(sd["primary_caps.pose.bias"]),
    )
    act = torch.sigmoid(
        F.conv2d(
            feat2d,
            torch.from_numpy(sd["primary_caps.a.weight"]),
            torch.from_numpy(sd["primary_caps.a.bias"]),
        )
    )
    caps_in = torch.cat([pose, act], dim=1).permute(0, 2, 3, 1)  # (B, h, w, 544)
    h = caps_in.shape[1]

    # ConvCaps votes + EM routing (numpy loop oracle)
    p_in = (
        caps_in[..., : 32 * psize].reshape(B * h * h, 32, P, P).numpy()
    )
    a_in = caps_in[..., 32 * psize :].reshape(B * h * h, 32, 1).numpy()
    W = sd["conv_caps.weights"][0]  # (32, C, P, P)
    votes = np.einsum("nipq,ijqr->nijpr", p_in, W).reshape(
        B * h * h, 32, C, psize
    )
    mu, a_out = em_oracle(
        votes.astype(np.float64),
        a_in.astype(np.float64),
        sd["conv_caps.beta_u"].astype(np.float64),
        sd["conv_caps.beta_a"].astype(np.float64),
    )
    poses = torch.from_numpy(
        mu.reshape(B, h, h, C * psize).astype(np.float32)
    )
    activations = torch.from_numpy(
        a_out.reshape(B, h, h, C).astype(np.float32)
    )

    scores = activations.mean(dim=(1, 2))  # (B, C)

    # eval: one-hot(argmax) class-conditional pose mask
    one_hot = torch.eye(C)[scores.argmax(dim=1)]  # (B, C)
    poses = poses.reshape(B, h, h, C, psize) * one_hot[:, None, None, :, None]
    poses = poses.reshape(B, h, h, C * psize).permute(0, 3, 1, 2)

    # Decoder
    def ct2(x, name, stride=1, padding=0, output_padding=0):
        return F.conv_transpose2d(
            x,
            torch.from_numpy(sd[f"{name}.weight"]),
            torch.from_numpy(sd[f"{name}.bias"]),
            stride=stride,
            padding=padding,
            output_padding=output_padding,
        )

    def ct3(x, name, stride=1, padding=0, output_padding=0):
        return F.conv_transpose3d(
            x,
            torch.from_numpy(sd[f"{name}.weight"]),
            torch.from_numpy(sd[f"{name}.bias"]),
            stride=stride,
            padding=padding,
            output_padding=output_padding,
        )

    def conv(x, name, dims, padding):
        fn = F.conv2d if dims == 2 else F.conv3d
        return fn(
            x,
            torch.from_numpy(sd[f"{name}.weight"]),
            torch.from_numpy(sd[f"{name}.bias"]),
            padding=padding,
        )

    x = F.relu(ct2(poses, "upsample1"))
    x = x.reshape(B, 64, 1, h28, h28)
    c28 = F.relu(conv(cross28, "conv28", 2, 1)).reshape(B, 64, 1, h28, h28)
    x = torch.cat([x, c28], dim=1)

    x = F.relu(ct3(x, "upsample2", stride=2, padding=1, output_padding=1))
    c56 = F.relu(conv(cross56, "conv56", 3, 1))
    x = torch.cat([x, c56], dim=1)
    x = F.relu(ct3(x, "upsample3", stride=2, padding=1, output_padding=1))
    c112 = F.relu(conv(cross112, "conv112", 3, 1))
    x = torch.cat([x, c112], dim=1)
    x = ct3(x, "upsample4", stride=2, padding=1, output_padding=1)
    x = ct3(x, "smooth", padding=1)

    H = img_np.shape[3]
    seg = x.reshape(B, 1, 8, H, H)
    return seg.numpy(), scores.numpy()

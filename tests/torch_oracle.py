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


# ---------------------------------------------------------------------------
# Train-mode differentiable oracle (torch autograd): BN batch statistics,
# class-conditional masking with gt/pseudo labels, full loss assembly.
# EM routing below is a deliberate literal transcription of the reference
# m_step/e_step (models/capsules_ucf101.py:108-211) in torch ops — a
# labeled parity oracle (like tests/test_eval_parity.py), not product code.
# ---------------------------------------------------------------------------


def em_routing_torch(v, a_in, beta_u, beta_a, iters=3, eps=1e-8, lam=1e-6):
    """Differentiable EM routing, double precision recommended."""
    b, Bi, C, psize = v.shape
    r = torch.full((b, Bi, C), 1.0 / C, dtype=v.dtype)
    a_out = mu = sigma_sq = None
    for it in range(iters):
        r1 = r * a_in
        r1 = r1 / (r1.sum(dim=2, keepdim=True) + eps)
        r_sum = r1.sum(dim=1, keepdim=True)
        coeff = (r1 / (r_sum + eps)).unsqueeze(-1)
        mu = (coeff * v).sum(dim=1, keepdim=True)
        sigma_sq = (coeff * (v - mu) ** 2).sum(dim=1, keepdim=True) + eps
        cost_h = (beta_u + torch.log(sigma_sq[:, 0].sqrt())) * r_sum.reshape(
            b, C, 1
        )
        cost_h = cost_h.sum(dim=2)
        cost_mean = cost_h.mean(dim=1, keepdim=True)
        cost_std = torch.sqrt(
            (cost_h - cost_mean).sum(dim=1, keepdim=True) ** 2 / C + eps
        )
        a_out = torch.sigmoid(
            lam * (beta_a - (cost_mean - cost_h) / (cost_std + eps))
        )
        if it < iters - 1:
            ln_p = (
                -((v - mu) ** 2) / (2.0 * sigma_sq)
                - torch.log(sigma_sq.sqrt())
                - 0.5 * float(np.log(2.0 * np.pi))
            )
            ln_ap = ln_p.sum(dim=3) + torch.log(eps + a_out.unsqueeze(1))
            r = torch.softmax(ln_ap, dim=2)
    return mu, a_out


def _unit3d_train(x, t, prefix, stride=(1, 1, 1), momentum=0.01):
    """Train-mode Unit3D: conv + batch-stat BN (running stats updated
    in-place on t's buffers, torch semantics) + ReLU."""
    w = t[f"{prefix}.conv3d.weight"]
    x = _same_pad(x, w.shape[2:], stride)
    x = F.conv3d(x, w, stride=stride)
    x = F.batch_norm(
        x,
        t[f"{prefix}.bn.running_mean"],
        t[f"{prefix}.bn.running_var"],
        t[f"{prefix}.bn.weight"],
        t[f"{prefix}.bn.bias"],
        training=True,
        momentum=momentum,
        eps=1e-3,
    )
    return F.relu(x)


def _inception_train(x, t, prefix):
    b0 = _unit3d_train(x, t, f"{prefix}.b0")
    b1 = _unit3d_train(_unit3d_train(x, t, f"{prefix}.b1a"), t, f"{prefix}.b1b")
    b2 = _unit3d_train(_unit3d_train(x, t, f"{prefix}.b2a"), t, f"{prefix}.b2b")
    b3 = _unit3d_train(
        _maxpool_same(x, (3, 3, 3), (1, 1, 1)), t, f"{prefix}.b3b"
    )
    return torch.cat([b0, b1, b2, b3], dim=1)


def capsnet_train_forward(img, t, labels, flags, epoch, thresh_epoch,
                          num_classes=24, P=4):
    """Train-mode forward on torch tensors (differentiable; dropout OFF —
    rate 0 on the jax side makes both deterministic).

    img: (B, 3, 8, H, W) tensor; labels (B,) long; flags (B,) float
    (1 = labeled).  Returns (seg (B, 1, 8, H, W), scores (B, C)).
    """
    psize = P * P
    C = num_classes
    prefix = "conv1."
    x = _unit3d_train(img, t, f"{prefix}Conv3d_1a_7x7", stride=(2, 2, 2))
    out112 = x
    x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
    x = _unit3d_train(x, t, f"{prefix}Conv3d_2b_1x1")
    x = _unit3d_train(x, t, f"{prefix}Conv3d_2c_3x3", stride=(2, 1, 1))
    out56 = x
    x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
    x = _inception_train(x, t, f"{prefix}Mixed_3b")
    x = _inception_train(x, t, f"{prefix}Mixed_3c")
    x = _maxpool_same(x, (3, 3, 3), (2, 1, 1))
    for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = _inception_train(x, t, f"{prefix}{name}")

    B = x.shape[0]
    h28 = x.shape[3]
    feat2d = x.reshape(B, 832, h28, h28)
    cross28 = feat2d

    pose = F.conv2d(
        feat2d, t["primary_caps.pose.weight"], t["primary_caps.pose.bias"]
    )
    act = torch.sigmoid(
        F.conv2d(feat2d, t["primary_caps.a.weight"], t["primary_caps.a.bias"])
    )
    caps_in = torch.cat([pose, act], dim=1).permute(0, 2, 3, 1)
    h = caps_in.shape[1]

    p_in = caps_in[..., : 32 * psize].reshape(B * h * h, 32, P, P)
    a_in = caps_in[..., 32 * psize :].reshape(B * h * h, 32, 1)
    votes = torch.einsum(
        "nipq,ijqr->nijpr", p_in, t["conv_caps.weights"][0]
    ).reshape(B * h * h, 32, C, psize)
    mu, a_out = em_routing_torch(
        votes, a_in, t["conv_caps.beta_u"], t["conv_caps.beta_a"]
    )
    poses = mu.reshape(B, h, h, C * psize)
    activations = a_out.reshape(B, h, h, C)
    scores = activations.mean(dim=(1, 2))

    # train-mode class-conditional masking (capsules_ucf101.py:455-470)
    one_hot_gt = torch.eye(C, dtype=img.dtype)[labels]
    one_hot_pred = torch.eye(C, dtype=img.dtype)[scores.argmax(dim=1)]
    if epoch < thresh_epoch:
        unlabeled_mask = torch.ones_like(one_hot_gt)
    else:
        unlabeled_mask = one_hot_pred
    sel = (flags == 0).to(img.dtype).unsqueeze(1)
    class_mask = sel * unlabeled_mask + (1.0 - sel) * one_hot_gt

    poses = poses.reshape(B, h, h, C, psize) * class_mask[:, None, None, :, None]
    poses = poses.reshape(B, h, h, C * psize).permute(0, 3, 1, 2)

    def ct2(x, name, **kw):
        return F.conv_transpose2d(x, t[f"{name}.weight"], t[f"{name}.bias"], **kw)

    def ct3(x, name, **kw):
        return F.conv_transpose3d(x, t[f"{name}.weight"], t[f"{name}.bias"], **kw)

    def conv(x, name, dims, padding):
        fn = F.conv2d if dims == 2 else F.conv3d
        return fn(x, t[f"{name}.weight"], t[f"{name}.bias"], padding=padding)

    x = F.relu(ct2(poses, "upsample1"))
    x = x.reshape(B, 64, 1, h28, h28)
    c28 = F.relu(conv(cross28, "conv28", 2, 1)).reshape(B, 64, 1, h28, h28)
    x = torch.cat([x, c28], dim=1)
    x = F.relu(ct3(x, "upsample2", stride=2, padding=1, output_padding=1))
    x = torch.cat([x, F.relu(conv(out56, "conv56", 3, 1))], dim=1)
    x = F.relu(ct3(x, "upsample3", stride=2, padding=1, output_padding=1))
    x = torch.cat([x, F.relu(conv(out112, "conv112", 3, 1))], dim=1)
    x = ct3(x, "upsample4", stride=2, padding=1, output_padding=1)
    x = ct3(x, "smooth", padding=1)

    H = img.shape[3]
    return x.reshape(B, 1, 8, H, H), scores


def train_loss_torch(t, img, aug, seg_gt, labels, flags, *, wt_loc=1.0,
                     wt_cls=1.0, wt_cons=0.1, epoch=1, thresh_epoch=11):
    """The full semi-supervised loss of train_model_interface
    (main_ucf101.py:50-150) with plain-L2 consistency: two sequential
    train-mode forwards (original + flipped), supervised BCE + Dice +
    SpreadLoss on labeled rows, consistency on all rows."""
    seg1, scores = capsnet_train_forward(
        img, t, labels, flags, epoch, thresh_epoch
    )
    seg2, _ = capsnet_train_forward(
        aug, t, labels, flags, epoch, thresh_epoch
    )
    lm = flags  # labeled-row mask (row_mask all ones here)
    n_lab = lm.sum().clamp(min=1.0)

    out = seg1[:, 0]  # (B, 8, H, W)
    elem = F.binary_cross_entropy_with_logits(out, seg_gt, reduction="none")
    per_elem = elem[0].numel()
    bce = (elem * lm.view(-1, 1, 1, 1)).sum() / (n_lab * per_elem)

    p = torch.sigmoid(out)
    m = lm.view(-1, 1, 1, 1)
    inter = (p * seg_gt * m).sum()
    dice = 1.0 - (2.0 * inter + 1.0) / (
        (p * m).sum() + (seg_gt * m).sum() + 1.0
    )

    # SpreadLoss with the double /b (losses.py:14-37)
    margin = 0.2
    at = scores.gather(1, labels.view(-1, 1))
    per = torch.clamp(margin - (at - scores), min=0.0) ** 2
    spread = (per * lm.view(-1, 1)).sum() / n_lab - margin**2
    spread = spread / n_lab

    flipped_pred = torch.flip(seg2[:, 0], dims=[3])
    cons = ((flipped_pred - out) ** 2).mean()

    return wt_loc * (bce + dice) + wt_cls * spread + wt_cons * cons

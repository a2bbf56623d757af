"""Shared fake reference-format state_dict builders for converter/parity tests."""

import numpy as np

MIXED_SPECS = {
    "Mixed_3b": (192, [64, 96, 128, 16, 32, 32]),
    "Mixed_3c": (256, [128, 128, 192, 32, 96, 64]),
    "Mixed_4b": (480, [192, 96, 208, 16, 48, 64]),
    "Mixed_4c": (512, [160, 112, 224, 24, 64, 64]),
    "Mixed_4d": (512, [128, 128, 256, 24, 64, 64]),
    "Mixed_4e": (512, [112, 144, 288, 32, 64, 64]),
    "Mixed_4f": (528, [256, 160, 320, 32, 128, 128]),
}


def fake_unit3d(sd, prefix, cin, cout, k, scale=1.0):
    rng = np.random.default_rng(abs(hash(prefix)) % 2**32)
    sd[f"{prefix}.conv3d.weight"] = (
        rng.standard_normal((cout, cin, *k)).astype(np.float32) * scale
    )
    sd[f"{prefix}.bn.weight"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    sd[f"{prefix}.bn.bias"] = (rng.standard_normal(cout) * 0.1).astype(np.float32)
    sd[f"{prefix}.bn.running_mean"] = (rng.standard_normal(cout) * 0.1).astype(
        np.float32
    )
    sd[f"{prefix}.bn.running_var"] = rng.uniform(0.5, 2, cout).astype(np.float32)


def fake_i3d_state_dict(prefix="", scale=1.0):
    sd = {}
    fake_unit3d(sd, f"{prefix}Conv3d_1a_7x7", 3, 64, (7, 7, 7), scale)
    fake_unit3d(sd, f"{prefix}Conv3d_2b_1x1", 64, 64, (1, 1, 1), scale)
    fake_unit3d(sd, f"{prefix}Conv3d_2c_3x3", 64, 192, (3, 3, 3), scale)
    for name, (cin, oc) in MIXED_SPECS.items():
        fake_unit3d(sd, f"{prefix}{name}.b0", cin, oc[0], (1, 1, 1), scale)
        fake_unit3d(sd, f"{prefix}{name}.b1a", cin, oc[1], (1, 1, 1), scale)
        fake_unit3d(sd, f"{prefix}{name}.b1b", oc[1], oc[2], (3, 3, 3), scale)
        fake_unit3d(sd, f"{prefix}{name}.b2a", cin, oc[3], (1, 1, 1), scale)
        fake_unit3d(sd, f"{prefix}{name}.b2b", oc[3], oc[4], (3, 3, 3), scale)
        fake_unit3d(sd, f"{prefix}{name}.b3b", cin, oc[5], (1, 1, 1), scale)
    return sd


def fake_capsnet_state_dict(scale=0.05, num_classes=24, P=4):
    rng = np.random.default_rng(7)
    sd = fake_i3d_state_dict(prefix="conv1.", scale=scale)
    C = num_classes
    sd["primary_caps.pose.weight"] = (
        rng.standard_normal((32 * P * P, 832, 9, 9)).astype(np.float32) * scale
    )
    sd["primary_caps.pose.bias"] = (rng.standard_normal(32 * P * P) * 0.1).astype(
        np.float32
    )
    sd["primary_caps.a.weight"] = (
        rng.standard_normal((32, 832, 9, 9)).astype(np.float32) * scale
    )
    sd["primary_caps.a.bias"] = (rng.standard_normal(32) * 0.1).astype(np.float32)
    sd["conv_caps.beta_u"] = rng.standard_normal((C, P * P)).astype(np.float32)
    sd["conv_caps.beta_a"] = rng.standard_normal(C).astype(np.float32)
    sd["conv_caps.weights"] = rng.standard_normal((1, 32, C, P, P)).astype(
        np.float32
    )
    for name, (ci, co, k) in {
        "upsample1": (C * P * P, 64, (9, 9)),
        "upsample2": (128, 64, (3, 3, 3)),
        "upsample3": (128, 64, (3, 3, 3)),
        "upsample4": (128, 128, (3, 3, 3)),
        "smooth": (128, 1, (3, 3, 3)),
    }.items():
        sd[f"{name}.weight"] = (
            rng.standard_normal((ci, co, *k)).astype(np.float32) * scale
        )
        sd[f"{name}.bias"] = (rng.standard_normal(co) * 0.1).astype(np.float32)
    for name, (co, ci, k) in {
        "conv28": (64, 832, (3, 3)),
        "conv56": (64, 192, (3, 3, 3)),
        "conv112": (64, 64, (3, 3, 3)),
    }.items():
        sd[f"{name}.weight"] = (
            rng.standard_normal((co, ci, *k)).astype(np.float32) * scale
        )
        sd[f"{name}.bias"] = (rng.standard_normal(co) * 0.1).astype(np.float32)
    return sd

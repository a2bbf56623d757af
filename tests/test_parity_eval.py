"""Plumbing tests for tools/parity_eval.py — the real-checkpoint parity
harness (BASELINE.md: f/v-mAP must match the reference numerically on
identical checkpoints; no real media exists here, so the harness chain
convert -> overlay -> protocol -> format -> diff is exercised on
synthetic stand-ins)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.parity_eval import (
    main,
    parse_reference_line,
    reference_format_line,
)
from tests.sd_fixtures import fake_capsnet_state_dict


def _fake_pth(tmp_path, **kw):
    import torch

    sd = fake_capsnet_state_dict(scale=0.05, **kw)
    path = str(tmp_path / "best_model_train_loss_3.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    return path


def test_parse_ucf_line():
    line = ("Accuracy: 0.8731 IoU/fmap/vmap 0.2 0.7123 0.6989 "
            "0.5 0.5231 0.5012")
    got = parse_reference_line(line, "ucf101")
    assert got == {
        "accuracy": 0.8731,
        "fmAP@0.2": 0.7123,
        "vmAP@0.2": 0.6989,
        "fmAP@0.5": 0.5231,
        "vmAP@0.5": 0.5012,
    }


def test_parse_jhmdb_line():
    # evaluate_jhmdb.py:185 has no 'IoU/fmap/vmap' token
    line = "Accuracy: 0.9 0.2 0.8 0.75 0.5 0.6 0.55"
    got = parse_reference_line(line, "jhmdb")
    assert got["fmAP@0.5"] == 0.6 and got["fmAP@0.2"] == 0.8
    assert got["vmAP@0.2"] == 0.75 and got["vmAP@0.5"] == 0.55


def test_parse_rejects_wrong_thresholds():
    with pytest.raises(ValueError):
        parse_reference_line("Accuracy: 0.9 0.3 0.8 0.75 0.5 0.6 0.55", "ucf101")
    with pytest.raises(ValueError):
        parse_reference_line("Accuracy: 0.9 0.2 0.8", "ucf101")


def test_format_line_roundtrips():
    summary = {
        "accuracy": 0.25, "fmAP@0.2": 0.51234, "vmAP@0.2": 0.5,
        "fmAP@0.5": 0.3333333333333333, "vmAP@0.5": 0.0,
    }
    for ds in ("ucf101", "jhmdb"):
        line = reference_format_line(summary, ds)
        back = parse_reference_line(line, ds)
        for k, v in back.items():
            assert v == pytest.approx(summary[k], abs=1e-12), (ds, k)
    assert "IoU/fmap/vmap" in reference_format_line(summary, "ucf101")
    assert "IoU/fmap/vmap" not in reference_format_line(summary, "jhmdb")


def test_load_variables_full_checkpoint(tmp_path):
    """Converter overlay covers the full variable tree (shapes only; the
    numeric parity of the conversion is pinned by test_model_parity)."""
    from tools.parity_eval import load_variables, parse_args

    from picad_tpu.models.capsules import CapsNet

    path = _fake_pth(tmp_path)
    args = parse_args(["--reference_pth", path])
    variables = load_variables(args, CapsNet(num_classes=24), input_hw=96)
    # spot-check a backbone leaf and a decoder leaf made it through
    k = variables["params"]["conv1"]["Conv3d_1a_7x7"]["kernel"]
    assert k.shape == (7, 7, 7, 3, 64) and float(np.abs(k).sum()) > 0
    assert float(np.abs(variables["params"]["smooth_kernel"]).sum()) > 0
    assert float(
        np.abs(variables["batch_stats"]["conv1"]["Mixed_4f"]["b0"]["bn"]["mean"]).sum()
    ) > 0


@pytest.mark.heavy
def test_parity_eval_end_to_end(tmp_path, capsys, require_accelerator):
    """Full harness: fake .pth + synthetic videos at 96^2, self-diff.

    Runs main() twice-in-one: the printed line is fed back as
    --reference_line, so the diff path must report PASS (exit 0) —
    bit-stable protocol + correct parsing of our own format.
    """
    path = _fake_pth(tmp_path)
    base = [
        "--reference_pth", path, "--synthetic", "2", "--input_hw", "96",
        "--clip_batch_size", "4", "--nan_safe",  # 2 videos < 24 classes:
        # the bit-parity default would print NaN mAPs (reference quirk)
    ]
    assert main(base) == 0
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("Accuracy:")
    ][-1]
    assert main(base + ["--reference_line", line]) == 0
    out = capsys.readouterr().out
    assert "PASS" in out
    # and a perturbed line must FAIL
    toks = line.split()
    toks[1] = "0.99999"  # corrupt the accuracy field only
    assert main(base + ["--reference_line", " ".join(toks)]) == 1
    assert "MISMATCH" in capsys.readouterr().out

"""One-command real-checkpoint evaluation-parity harness.

The accuracy half of the north star (BASELINE.md): given a reference
`.pth` checkpoint and the real dataset, the repo's evaluation protocol
must print f-mAP / v-mAP numbers that MATCH the reference's
`evaluate_ucf101.py` / `evaluate_jhmdb.py` printout on the same weights.
This tool is that last mile as a single command:

  python tools/parity_eval.py \
      --reference_pth  trained_wts/best_model_train_loss_37.pth \
      --data_root      /data/ucf101 \
      --annotation_root /data/pkls \
      [--rgb_charades  /data/rgb_charades.pt] \
      [--reference_line "Accuracy: 0.87 IoU/fmap/vmap 0.2 0.71 0.69 0.5 0.52 0.50"] \
      [--tol 5e-4]

What it does:
1. converts the torch state_dict (checkpoint/torch_convert.py — layouts
   golden-tested against a torch oracle, tests/test_model_parity.py);
2. overlays it onto the JAX CapsNet at f32 (the bit-parity configuration;
   production bf16 is a different, faster code path);
3. runs the repo's full-video protocol (eval/engine.py — clip chunking,
   sigmoid>=0.5, 20-threshold sweep; judge-diffed against
   evaluate_ucf101.py:83-189);
4. prints the metrics line in the REFERENCE's exact print() format
   (evaluate_ucf101.py:189 / evaluate_jhmdb.py:185), so the two runs can
   be diffed as text;
5. optionally parses `--reference_line` (paste the line the reference
   printed for the same checkpoint) and reports per-field deltas with a
   PASS/FAIL verdict at `--tol` (exit code 1 on FAIL).

JHMDB variant: `--dataset jhmdb --list_file testlist.txt --mask_root
/data/puppet_masks` (21 classes; the reference line has no
'IoU/fmap/vmap' token, evaluate_jhmdb.py:185 — both formats parse).

No UCF101/JHMDB media exists in this build environment, so the harness
cannot be *measured* here; its plumbing (convert -> overlay -> protocol
-> format -> diff) is exercised end-to-end on synthetic stand-ins by
tests/test_parity_eval.py (fake .pth via tests/sd_fixtures.py, synthetic
videos).  See PARITY.md for the full runbook.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Fields of the printout, in print order (threshold tokens excluded)
_FIELDS = ("accuracy", "fmAP@0.2", "vmAP@0.2", "fmAP@0.5", "vmAP@0.5")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="reference-checkpoint parity eval")
    p.add_argument("--reference_pth", required=True,
                   help="reference CapsNet .pth (full state_dict)")
    p.add_argument("--rgb_charades", default="",
                   help="optional I3D backbone .pt underlay, applied before "
                   "the .pth overlay (mirrors the reference's load order: "
                   "capsules_ucf101.py:344-353 then load_previous_weights)")
    p.add_argument("--dataset", choices=("ucf101", "jhmdb"), default="ucf101")
    p.add_argument("--data_root", default="")
    p.add_argument("--annotation_root", default="",
                   help="UCF101: directory holding the annotation pickles")
    p.add_argument("--test_file", default="testing_annots.pkl",
                   help="UCF101 eval pickle (ucf_dataloader_eval.py reads "
                   "testing_annots.pkl; test_annots.pkl is the TRAIN-val "
                   "split — a known pitfall, main_ucf101.py:347)")
    p.add_argument("--list_file", default="",
                   help="JHMDB: txt list of test videos")
    p.add_argument("--mask_root", default="",
                   help="JHMDB: puppet_mask.mat root")
    p.add_argument("--clip_batch_size", type=int, default=14)
    p.add_argument("--seed", type=int, default=47,
                   help="single-annotation choice seed: draws come from "
                   "the legacy MT19937 stream in dataset order, the exact "
                   "np.random.seed(47)+np.random.randint draws of the "
                   "reference at num_workers=0 (evaluate_ucf101.py:36, "
                   "ucf_dataloader_eval.py:135-137; see PARITY.md for the "
                   "num_workers=8 caveat)")
    p.add_argument("--decoder", choices=("cv2", "skvideo"), default="cv2",
                   help="UCF decode stack; 'skvideo' reproduces the "
                   "reference's skvideo.io.vread path bit-for-bit given "
                   "the same ffmpeg (needs the optional scikit-video "
                   "package), 'cv2' pixels are usually identical but not "
                   "provably so")
    p.add_argument("--channel_order", choices=("reference", "rgb"),
                   default="reference",
                   help="JHMDB channel order: 'reference' = raw cv2 BGR, "
                   "what every reference JHMDB checkpoint was trained on "
                   "(jhmdb_dataloader_eval.py:108-118 never converts)")
    p.add_argument("--reference_line", default="",
                   help="paste the line the REFERENCE eval printed for this "
                   "checkpoint; the tool diffs every field against it")
    p.add_argument("--tol", type=float, default=5e-4,
                   help="absolute tolerance per field for the PASS verdict "
                   "(mAPs are ratios of integer threshold-hit counts, so "
                   "true parity is exact; the default absorbs print() "
                   "rounding in a pasted line)")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="use N synthetic eval videos instead of real data "
                   "(plumbing test mode)")
    p.add_argument("--input_hw", type=int, default=224,
                   help="clip side length; 224 is the protocol (the only "
                   "reason to change it is the hermetic plumbing test, "
                   "which runs the full chain at 96 to bound compile time)")
    p.add_argument("--eval_dp", type=int, default=0,
                   help="shard clip batches over N devices (0/1 = single)")
    p.add_argument("--nan_safe", action="store_true",
                   help="mean over present classes only; the default matches "
                   "the reference bit-for-bit (np.mean propagates NaN when a "
                   "class has no test videos, evaluate_ucf101.py:184-187 — "
                   "full UCF/JHMDB test sets cover every class, so this only "
                   "matters on partial test sets)")
    return p.parse_args(argv)


def parse_reference_line(line: str, dataset: str) -> dict[str, float]:
    """Extract the 5 metric fields from a reference printout line.

    UCF101 (evaluate_ucf101.py:189):
      Accuracy: <acc> IoU/fmap/vmap 0.2 <f2> <v2> 0.5 <f5> <v5>
    JHMDB (evaluate_jhmdb.py:185): same without the 'IoU/fmap/vmap' token.
    Both reduce to: all floats = [acc, 0.2, f2, v2, 0.5, f5, v5].
    """
    floats = [float(t) for t in re.findall(
        r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", line
    )]
    if len(floats) != 7:
        raise ValueError(
            f"expected 7 numbers (acc, 0.2, f2, v2, 0.5, f5, v5) in the "
            f"reference line, found {len(floats)}: {line!r}"
        )
    acc, t2, f2, v2, t5, f5, v5 = floats
    if not (abs(t2 - 0.2) < 1e-9 and abs(t5 - 0.5) < 1e-9):
        raise ValueError(
            f"threshold tokens should be 0.2 and 0.5, got {t2} and {t5} — "
            f"is this a {dataset} eval line?"
        )
    return dict(zip(_FIELDS, (acc, f2, v2, f5, v5)))


def load_variables(args, model, input_hw: int):
    """Fresh variable shapes + converted-weight overlay.

    The variable tree is built with eval_shape (no init compile): a FULL
    reference checkpoint covers every leaf.  Partial checkpoints fail
    loudly — silent zero-weights would produce garbage metrics that LOOK
    like a parity miss.
    """
    import jax
    import jax.numpy as jnp

    from picad_tpu.checkpoint.torch_convert import (
        convert_capsnet_state_dict,
        convert_i3d_backbone,
        load_torch_state_dict,
        merge_into_variables,
    )

    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": key, "dropout": key},
            jnp.zeros((1, 8, input_hw, input_hw, 3), jnp.float32),
            jnp.zeros((1,), jnp.int32),
            jnp.ones((1,), jnp.float32),
            0,
            0,
            False,
        )
    )
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)

    if args.rgb_charades:
        i3d_sd = load_torch_state_dict(args.rgb_charades)
        p, s, n = convert_i3d_backbone(i3d_sd)
        variables = merge_into_variables(variables, p, s)
        print(f"[parity] rgb_charades underlay: {n} tensors", file=sys.stderr)

    sd = load_torch_state_dict(args.reference_pth)
    params, stats, n = convert_capsnet_state_dict(sd)
    expected = 45 * 5 + 4 + 3 + 16  # Unit3Ds + primary + conv caps + decoder
    if n < expected and not args.rgb_charades:
        raise SystemExit(
            f"[parity] {args.reference_pth} converted only {n}/{expected} "
            "tensors — a partial checkpoint needs --rgb_charades for the "
            "backbone, and parity only holds on FULL checkpoints"
        )
    print(f"[parity] checkpoint overlay: {n} tensors", file=sys.stderr)
    return merge_into_variables(variables, params, stats)


def build_dataset(args):
    from picad_tpu.data.dataset import EvalVideoDataset
    from picad_tpu.data.sources import (
        JHMDBVideoSource,
        SyntheticVideoSource,
        UCFVideoSource,
    )

    n_classes = 24 if args.dataset == "ucf101" else 21
    if args.synthetic:
        src = SyntheticVideoSource(
            args.synthetic, num_classes=n_classes, seed=args.seed
        )
    elif args.dataset == "ucf101":
        src = UCFVideoSource(
            os.path.join(args.annotation_root, args.test_file),
            args.data_root,
            single_annotation=True,
            annotation_seed=args.seed,
            decoder=args.decoder,
        )
    else:
        if not args.list_file or not args.mask_root:
            raise SystemExit(
                "[parity] --dataset jhmdb needs --list_file and --mask_root"
            )
        # resize=None: the reference eval crops the RAW-resolution video
        # and scores against the unresized puppet masks
        # (jhmdb_dataloader_eval.py:83-140) — never the train loader's
        # 256x256 geometry.
        src = JHMDBVideoSource(
            args.list_file, args.data_root, args.mask_root,
            channel_order=args.channel_order, resize=None,
        )
    hw = (args.input_hw, args.input_hw)
    return EvalVideoDataset(src, clip_shape=hw), n_classes


def reference_format_line(summary: dict, dataset: str) -> str:
    """The reference's exact print() output for these numbers."""
    r = lambda k: repr(float(summary[k]))  # np.float64 repr is not a number
    parts = ["Accuracy:", r("accuracy")]
    if dataset == "ucf101":
        parts.append("IoU/fmap/vmap")  # evaluate_ucf101.py:189 literal
    parts += [
        "0.2", r("fmAP@0.2"), r("vmAP@0.2"),
        "0.5", r("fmAP@0.5"), r("vmAP@0.5"),
    ]
    return " ".join(parts)


def main(argv=None) -> int:
    args = parse_args(argv)

    from picad_tpu.eval.engine import evaluate_dataset
    from picad_tpu.eval.runner import _mesh_or_none, make_padded_forward
    from picad_tpu.models.capsules import CapsNet

    dataset, n_classes = build_dataset(args)
    # f32 end to end: the golden-parity configuration (CapsNet defaults)
    model = CapsNet(num_classes=n_classes)
    variables = load_variables(args, model, input_hw=args.input_hw)

    mesh = _mesh_or_none(args.eval_dp)
    forward = make_padded_forward(
        model, variables, clip_batch_size=args.clip_batch_size, mesh=mesh
    )
    summary = evaluate_dataset(
        forward, dataset, n_classes=n_classes,
        clip_batch_size=args.clip_batch_size, verbose=False,
        nan_safe=args.nan_safe,
    )
    print(reference_format_line(summary, args.dataset))

    if not args.reference_line:
        print(
            "[parity] no --reference_line given; paste the reference eval's "
            "printout for this checkpoint to get a field-by-field diff",
            file=sys.stderr,
        )
        return 0

    ref = parse_reference_line(args.reference_line, args.dataset)
    ok = True
    print(f"{'field':>10} {'reference':>12} {'ours':>12} {'delta':>12}")
    for field in _FIELDS:
        ours, theirs = float(summary[field]), ref[field]
        delta = ours - theirs
        flag = "" if abs(delta) <= args.tol else "  <-- MISMATCH"
        ok &= not flag
        print(f"{field:>10} {theirs:>12.6f} {ours:>12.6f} {delta:>+12.2e}{flag}")
    print(f"[parity] {'PASS' if ok else 'FAIL'} at tol={args.tol}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

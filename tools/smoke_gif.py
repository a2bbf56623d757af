"""Eval-loader GIF smoke: dump one eval sample (and its h-flip) as GIFs.

The runnable counterpart of the reference eval-loader's `__main__` smoke
(ucf_dataloader_eval.py:163-187: write orig_XX_gt.gif / flip_XX_gt.gif
for visual inspection of the whole-video eval sample).  Runs hermetically
on the synthetic backend — no datasets, no device.

Usage:
    python tools/smoke_gif.py [outdir] [index]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from picad_tpu.data.dataset import EvalVideoDataset
from picad_tpu.data.sources import SyntheticVideoSource
from picad_tpu.utils.visualize import dump_clip_gif, overlay2


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/picad_gif_smoke"
    index = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    os.makedirs(outdir, exist_ok=True)

    ds = EvalVideoDataset(
        SyntheticVideoSource(8, num_classes=24, seed=7),
        clip_shape=(224, 224),
    )
    print(len(ds))
    video, mask, label = ds[index]
    print(video.shape, mask.shape, label)

    dump_clip_gif(video, f"{outdir}/orig_{index:02d}_gt.gif", stride=2)
    # the eval path evaluates the h-flipped clip too (evaluate_ucf101.py
    # flip stream); dump it like the reference smoke does
    dump_clip_gif(video[:, :, ::-1], f"{outdir}/flip_{index:02d}_gt.gif",
                  stride=2)
    overlay2(mask[0, ..., 0], video[0],
             save=f"{outdir}/overlay_{index:02d}.png")
    print("Done for", index, "->", outdir)


if __name__ == "__main__":
    main()

"""Host input-pipeline benchmark: clips/sec the loader can assemble.

Measures SemiSupervisedBatcher end-to-end (sample -> crop/flip/normalize
-> collate) WITHOUT any device work, for:

  - synthetic backend (decode-free: upper bound of the assembly path)
  - ucf101 (if --data_root/--annotation_root given), optionally with
    --decoded_cache_dir (pre-decoded .npy memmaps) and/or
    --video_cache_gb (in-memory LRU)

The device step consumes bs=8 clips every ~80 ms at the 100 clips/s/chip
target; the loader must sustain >= that per chip.

Usage: python tools/bench_loader.py [--workers 8] [--bs 8] ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def bench_batcher(batcher, *, epochs=(1, 2), label=""):
    from itertools import islice

    results = {}
    for e in epochs:
        n_clips = 0
        t0 = time.perf_counter()
        for batch in islice(batcher.epoch(e), 64):
            n_clips += int(batch["row_mask"].sum())
        dt = time.perf_counter() - t0
        results[e] = n_clips / dt
        print(f"  {label} epoch {e}: {n_clips} clips in {dt:.2f}s "
              f"= {n_clips / dt:.1f} clips/s")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--data_root", type=str, default="")
    ap.add_argument("--annotation_root", type=str, default="")
    ap.add_argument("--decoded_cache_dir", type=str, default="")
    ap.add_argument("--video_cache_gb", type=float, default=0.0)
    ap.add_argument("--num_videos", type=int, default=96)
    args = ap.parse_args()

    from picad_tpu.data.dataset import ClipDataset
    from picad_tpu.data.loader import SemiSupervisedBatcher
    from picad_tpu.data.sources import (
        CachedVideoSource,
        SyntheticVideoSource,
        UCFVideoSource,
    )

    def wrap(src):
        if args.video_cache_gb > 0:
            return CachedVideoSource(
                src, capacity_bytes=int(args.video_cache_gb * (1 << 30))
            )
        return src

    print(f"workers={args.workers} bs={args.bs}")

    # synthetic: assembly-path upper bound (no decode)
    lab = ClipDataset(
        wrap(SyntheticVideoSource(args.num_videos, labeled_fraction=1.0, seed=1)),
        train=True,
    )
    unl = ClipDataset(
        wrap(SyntheticVideoSource(args.num_videos, labeled_fraction=0.0, seed=2)),
        train=True,
    )
    b = SemiSupervisedBatcher(
        lab, unl, batch_size=args.bs, seed=0, workers=args.workers,
        process_index=0, process_count=1,
    )
    bench_batcher(b, label="synthetic")

    if args.data_root and args.annotation_root:
        kw = dict(
            decoded_cache_dir=args.decoded_cache_dir or None,
        )
        lab = ClipDataset(
            wrap(UCFVideoSource(
                os.path.join(args.annotation_root, "train_annots_20_labeled.pkl"),
                args.data_root, **kw)),
            train=True,
        )
        unl = ClipDataset(
            wrap(UCFVideoSource(
                os.path.join(args.annotation_root,
                             "train_annots_80_unlabeled.pkl"),
                args.data_root, **kw)),
            train=True,
        )
        b = SemiSupervisedBatcher(
            lab, unl, batch_size=args.bs, seed=0, workers=args.workers,
            process_index=0, process_count=1,
        )
        # epoch 1 populates the .npy cache; epoch 2 shows the memmap rate
        bench_batcher(b, label="ucf101")


if __name__ == "__main__":
    main()

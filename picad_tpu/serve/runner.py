"""Serving-side wrapper around an exported eval forward.

Provides the two call shapes a deployment needs:

- `predict_clips`: ragged clip batches -> (sigmoid_seg, class_scores),
  zero-padding to the compiled batch shape and dropping padding rows on
  the host — identical discipline to eval/runner.py:make_padded_forward
  (one compiled program, no retraces).
- `predict_video`: an arbitrary-length (F, H, W, 3) video -> per-frame
  segmentation (F, H, W, 1) plus the video-level class prediction.  The
  clip construction is the reference's sliding 8-frame / f_skip=2
  interleave (evaluate_ucf101.py:79-101 via eval/clips.py) with
  `drop_empty=False` — serving has no ground-truth mask to drop on —
  and the interleave is inverted to stitch clip predictions back onto
  their source frame indices (each frame is covered by exactly one
  (window, offset, position) triple).  Video class = argmax of the mean
  clip score (eval/engine.py:138).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


class ServingModel:
    """A loaded artifact: callable on fixed-shape clip batches, with
    host-side padding/chunking conveniences.  Construct via
    serve.export.load_artifact()."""

    def __init__(self, call, meta: Mapping[str, Any]):
        self._call = call
        self.meta = dict(meta)
        self.clip_batch_size = int(meta["clip_batch_size"])
        self.depth = int(meta.get("depth", 8))
        self.height = int(meta["height"])
        self.width = int(meta["width"])

    @property
    def input_shape(self) -> tuple[int, ...]:
        return (
            self.clip_batch_size, self.depth, self.height, self.width, 3
        )

    def predict_clips(
        self, clips: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """(N, depth, H, W, 3) f32 -> (sigmoid_seg (N, depth, H, W),
        class_scores (N, C)); N may be ragged (any size >= 1)."""
        n = clips.shape[0]
        bs = self.clip_batch_size
        if clips.shape[1:] != self.input_shape[1:]:
            raise ValueError(
                f"clip shape {clips.shape[1:]} != artifact "
                f"{self.input_shape[1:]}"
            )
        segs, scores = [], []
        for i in range(0, n, bs):
            chunk = clips[i : i + bs]
            k = chunk.shape[0]
            if k < bs:
                chunk = np.concatenate(
                    [
                        chunk,
                        np.zeros((bs - k, *chunk.shape[1:]), chunk.dtype),
                    ],
                    axis=0,
                )
            seg, sc = self._call(chunk.astype(np.float32))
            segs.append(np.asarray(seg)[:k])
            scores.append(np.asarray(sc)[:k])
        return np.concatenate(segs, axis=0), np.concatenate(scores, axis=0)

    def predict_video(
        self, video: np.ndarray, *, f_skip: int = 2
    ) -> dict[str, Any]:
        """(F, H, W, 3) f32 video -> {"segmentation" (F, H, W, 1),
        "pred_label" int, "scores" (C,) mean clip score}."""
        from picad_tpu.eval.clips import chunk_video_into_clips

        n_frames = video.shape[0]
        dummy_mask = np.zeros((*video.shape[:3], 1), np.float32)
        clips, _ = chunk_video_into_clips(
            video, dummy_mask, depth=self.depth, f_skip=f_skip,
            drop_empty=False,
        )
        seg, scores = self.predict_clips(clips)
        out = np.zeros((n_frames, self.height, self.width, 1), np.float32)
        # invert the interleave: clip index c = (i // (depth*f_skip)) *
        # f_skip + j holds frames i + j + k*f_skip, k = 0..depth-1
        c = 0
        for i in range(0, n_frames, self.depth * f_skip):
            for j in range(f_skip):
                for k in range(self.depth):
                    ind = i + j + k * f_skip
                    if ind < n_frames:
                        out[ind, :, :, 0] = seg[c, k]
                c += 1
        mean_scores = scores.mean(axis=0)
        return {
            "segmentation": out,
            "pred_label": int(np.argmax(mean_scores)),
            "scores": mean_scores,
        }

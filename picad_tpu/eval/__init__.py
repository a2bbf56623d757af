"""Evaluation: clip chunking, metrics, and the f-mAP/v-mAP protocol."""

from picad_tpu.eval.metrics import binary_mask_iou, get_accuracy
from picad_tpu.eval.clips import chunk_video_into_clips
from picad_tpu.eval.engine import VideoMetrics, evaluate_dataset

"""Input pipeline: video sources, clip sampling, batching, device prefetch."""

from picad_tpu.data.sources import (
    JHMDBVideoSource,
    SyntheticVideoSource,
    UCFVideoSource,
    rasterize_boxes,
)
from picad_tpu.data.dataset import ClipDataset, EvalVideoDataset
from picad_tpu.data.loader import PrefetchLoader, SemiSupervisedBatcher

"""Device-resident decoded-video cache: clips assemble ON the TPU.

The streaming pipeline ships every sampled clip over host->device DMA
(~13 MB per bs=8 batch).  On hosts where that link is thin — notably
tunneled/remote attachments, but also any setup where H2D serializes
with compute — the transfer dominates end-to-end step time even with
double buffering.  The TPU-first alternative implemented here: decoded
videos live in device HBM as one uint8 frame pool, and each training
step ships only CLIP METADATA (pool frame indices + crop origin +
validity, ~100 bytes/sample).  A tiny jitted ASSEMBLER program
(`assemble_batch`, dispatched from the loader's prefetch thread) turns
metadata into a plain-layout uint8 pixel batch on device (~0.9 ms at
bs=8/224^2), and the train step itself is the SAME program as the
streaming path — steady-state input cost is a few hundred host bytes
per step.  (A round-3 design fused the gather into the train step
instead; its layout choices leaked ~9 ms/step of relayout copies into
the step body — see assemble_batch's docstring for the trace record.)

Semantics are identical to the streaming path: `DeviceClipDataset`
reuses `ClipDataset`'s sampling rules (same rng stream, same
vskip/boundary/zero-sample behaviour — datasets/ucf_dataloader.py:86-148)
and `assemble_clips_on_device` reproduces the crop + (mask > 0) & valid
assembly bit-for-bit (tests/test_device_cache.py checks batch parity
against the host path).

Capacity: the pool must fit `budget_bytes`.  UCF101-24's 20%-labeled
stream (the one the reference cycles several times per epoch,
main_ucf101.py:173-178) fits a v5e chip's spare HBM; for datasets that
don't fit, callers keep the streaming path (`build()` raises, the CLI
falls back).  Multi-host meshes cache each host's disjoint video shard
on its own chips — the batcher already drives per-host index shards.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from picad_tpu.data.dataset import ClipDataset
from picad_tpu.data.sources import VideoRecord


class _ShapeOnly:
    """Stands in for a decoded video inside metadata-only VideoRecords."""

    def __init__(self, shape):
        self.shape = shape
        self.dtype = np.uint8


@dataclasses.dataclass
class _MetaSource:
    """Light host-side view of a cached source: shapes + annotations."""

    records: list  # VideoRecord with _ShapeOnly video, or None

    def __len__(self):
        return len(self.records)

    def load(self, index):
        return self.records[index]


class DeviceVideoCache:
    """Uploads a whole VideoSource into one device-resident frame pool.

    pool_video: (1 + sum(F_i), H, W, 3) uint8 — slot 0 is an all-zero
    frame that degraded samples and ragged-batch padding point at.
    pool_mask:  same leading dim, (H, W, 1) uint8 in {0, 1} (thresholded
    at upload: the host path's `mask > 0` happens once here).
    """

    def __init__(self, pool_video, pool_mask, offsets, meta_source,
                 frame_hw):
        self.pool_video = pool_video
        self.pool_mask = pool_mask
        self.offsets = offsets  # per-video first-frame index into the pool
        self.meta_source = meta_source
        self.frame_hw = frame_hw

    @classmethod
    def build(cls, source, *, budget_bytes: int = 8 << 30, device_put=None,
              chunk_bytes: int = 256 << 20):
        """Decode every video in `source` once and upload to device.

        Raises ValueError if the pool would exceed `budget_bytes` (the
        caller then keeps the host streaming pipeline).  `device_put`
        defaults to jax.device_put; pass a sharded put for replicated
        multi-device pools.
        """
        import jax
        import jax.numpy as jnp

        if device_put is None:
            device_put = jax.device_put

        videos, masks, metas = [], [], []
        frame_hw = None
        total_frames = 1  # slot 0 reserved for the zero frame
        offsets = np.zeros((len(source),), np.int64)
        for i in range(len(source)):
            rec = source.load(i)
            if rec is None or rec.video.dtype != np.uint8:
                metas.append(None)
                videos.append(None)
                masks.append(None)
                continue
            f, h, w, _ = rec.video.shape
            if frame_hw is None:
                frame_hw = (h, w)
            elif frame_hw != (h, w):
                raise ValueError(
                    f"video {i} is {h}x{w}, pool is {frame_hw[0]}x{frame_hw[1]}"
                )
            offsets[i] = total_frames
            total_frames += f
            bytes_needed = total_frames * h * w * 4  # rgb + mask channel
            if bytes_needed > budget_bytes:
                raise ValueError(
                    f"device video cache needs >{bytes_needed >> 20} MiB "
                    f"(budget {budget_bytes >> 20} MiB) at video {i}/"
                    f"{len(source)} — keep the streaming pipeline"
                )
            videos.append(np.ascontiguousarray(rec.video))
            masks.append((rec.mask.reshape(f, h, w, 1) > 0).astype(np.uint8))
            metas.append(
                VideoRecord(
                    video=_ShapeOnly((f, h, w, 3)),
                    mask=_ShapeOnly((f, h, w, 1)),
                    label=rec.label,
                    annot_frames=np.asarray(rec.annot_frames),
                    labeled=rec.labeled,
                    name=rec.name,
                )
            )
        if frame_hw is None:
            raise ValueError("no decodable videos in source")
        h, w = frame_hw

        # Upload in bounded chunks (device_put of one huge host array
        # would double peak host memory), then concatenate on device.
        def upload(parts, channels, dtype):
            zero = np.zeros((1, h, w, channels), dtype)
            chunks, cur, cur_bytes = [], [zero], zero.nbytes
            for p in parts:
                if p is None:
                    continue
                cur.append(p)
                cur_bytes += p.nbytes
                if cur_bytes >= chunk_bytes:
                    chunks.append(device_put(np.concatenate(cur)))
                    cur, cur_bytes = [], 0
            if cur:
                chunks.append(device_put(np.concatenate(cur)))
            return jnp.concatenate(chunks) if len(chunks) > 1 else chunks[0]

        pool_video = upload(videos, 3, np.uint8)
        pool_mask = upload(masks, 1, np.uint8)
        return cls(pool_video, pool_mask, offsets, _MetaSource(metas), frame_hw)


class DeviceClipDataset(ClipDataset):
    """ClipDataset over a DeviceVideoCache: yields clip METADATA samples.

    Sample layout (all tiny; ~100 bytes):
      frame_idx (depth,) int32 — absolute pool frame indices (0 = zero)
      crop_y / crop_x     int32 — crop origin
      valid (depth,) float32    — per-frame validity (JHMDB rule)
      action / label_vid  int32

    The pixel work happens in the jitted `assemble_batch` program on
    the loader's prefetch thread (make_assembler_put).  Sampling
    decisions (clip span, crop, degrade-to-zero)
    are IDENTICAL to the host ClipDataset: same `_sample_plan`, same
    per-(seed, epoch, index) rng stream.
    """

    def __init__(
        self,
        cache: DeviceVideoCache,
        *,
        index_offset: int = 0,
        length: int | None = None,
        **kwargs,
    ):
        """`index_offset`/`length` expose a contiguous window of the
        merged cache as its own dataset (e.g. labeled videos 0..n_l-1,
        unlabeled n_l..n_l+n_u-1 in one shared frame pool) while the rng
        stream stays keyed by the LOCAL index — same sampling decisions
        as separate host datasets over the separate sources."""
        kwargs.setdefault("device_prep", True)
        kwargs.setdefault("use_native", False)
        super().__init__(cache.meta_source, **kwargs)
        self.cache = cache
        self.index_offset = index_offset
        self.length = (
            length if length is not None else len(cache.meta_source) - index_offset
        )

    def __len__(self) -> int:
        return self.length

    @property
    def supports_fill(self) -> bool:
        return False  # samples are tiny dicts; the generic path is cheap

    def _zero_meta(self):
        return {
            "frame_idx": np.zeros((self.depth,), np.int32),
            "crop_y": np.int32(0),
            "crop_x": np.int32(0),
            "valid": np.zeros((self.depth,), np.float32),
            "action": np.int32(0),
            "label_vid": np.int32(0),
        }

    def zero_sample(self):
        """Degraded/padding sample in THIS dataset's metadata layout.

        Overrides ClipDataset.zero_sample (pixel layout) — a pixel-layout
        zero sample would not collate with the metadata samples
        __getitem__ yields (e.g. the all-pad lockstep branch in
        train/loop.py validate)."""
        return self._zero_meta()

    def __getitem__(self, index: int):
        gidx = index + self.index_offset
        plan = self._sample_plan(index, source_index=gidx)
        if plan is None:
            return self._zero_meta()
        rec, span, y, x, valid = plan
        base = int(self.cache.offsets[gidx])
        return {
            "frame_idx": (base + span).astype(np.int32),
            "crop_y": np.int32(y),
            "crop_x": np.int32(x),
            "valid": valid.astype(np.float32),
            "action": np.int32(rec.label),
            "label_vid": np.int32(rec.labeled),
        }


def assemble_batch(pools, meta, out_hw: tuple[int, int]):
    """Metadata batch -> PLAIN-layout pixel batch (the loader stage).

    Emits exactly the streaming path's device_prep batch layout —
    data uint8 (B, d, h, w, 3), loc_msk uint8 (B, d, h, w, 1) with the
    JHMDB per-frame validity ANDed in, plus the passthrough scalars —
    so the train step is ONE program regardless of input path.

    Why a separate program instead of fusing the gather into the step
    (the round-3 design): the in-step gather's layout choices leaked
    into the step body — XLA materialized the horizontal flip as an f32
    reverse (~4.2 ms), plus space-to-depth reshape/copy pairs (~3.7 ms)
    and an unfused /255 convert (~1.4 ms) that the plain-parameter step
    fuses away; ~9.2 ms/step of pure relayout at bs=8/224^2 on v5e,
    while this whole assembler runs ~0.9 ms (tools/trace_cached.py,
    tools/probe_gather.py, 2026-08-19).  As a loader stage it also
    reuses the plain step's compile-cache entry.
    """
    import jax.numpy as jnp

    data, mask = _gather_clips(
        pools["pool_video"], pools["pool_mask"], meta["frame_idx"],
        meta["crop_y"], meta["crop_x"], out_hw,
    )
    # valid is float32 {0, 1} (JHMDB per-frame validity; all-ones for
    # UCF).  Compare-then-cast: a bare .astype(uint8) would TRUNCATE any
    # future fractional validity to 0 silently, where the host path
    # multiplies by the float value — (> 0) keeps the binary contract
    # loud and the AND keeps loc_msk in {0, 1}.
    valid_u8 = (meta["valid"] > 0).astype(jnp.uint8)
    batch = {
        "data": data,
        "loc_msk": mask * valid_u8[:, :, None, None, None],
        "action": meta["action"],
        "label_vid": meta["label_vid"],
    }
    if "row_mask" in meta:
        batch["row_mask"] = meta["row_mask"]
    return batch


def make_assembler_put(pools, out_hw: tuple[int, int], *, sharding=None,
                       put_batch=None):
    """PrefetchLoader `put_fn`: host metadata batch -> device pixel batch.

    The device_put of the ~100-byte metadata and the jitted
    `assemble_batch` dispatch both run on the loader's prefetch thread,
    overlapping the previous step's compute.  `sharding` (a batch
    NamedSharding) shards the metadata and the assembled batch alike;
    `put_batch` overrides the metadata placement (e.g. a multi-host
    put_global_batch).

    MULTI-PROCESS CONSTRAINT: in multi-host runs this jit dispatches
    from the prefetch thread, whose launch order relative to the main
    thread's train-step launches differs per process.  That is safe ONLY
    because the compiled assembler contains NO collectives: the pools
    are fully replicated, the metadata arrives pre-sharded along the
    batch axis, and out_shardings match the gather's natural placement,
    so XLA compiles a pure per-device gather.  An accidental reshard
    (e.g. pools sharded, or out_shardings that disagree with the
    metadata placement) would insert collectives whose cross-process
    launch order is unsynchronized — a deadlock.  `put` asserts the
    replicated-pools half of that contract on the first call.
    """
    import functools

    import jax

    jitted = jax.jit(
        functools.partial(assemble_batch, out_hw=out_hw),
        **({"out_shardings": sharding} if sharding is not None else {}),
    )

    if jax.process_count() > 1 or sharding is not None:
        for name, pool in pools.items():
            ps = getattr(pool, "sharding", None)
            if ps is not None and not ps.is_fully_replicated:
                raise ValueError(
                    f"make_assembler_put: {name} must be fully replicated "
                    f"(got {ps}) — a sharded pool would compile collectives "
                    "into the assembler, whose prefetch-thread launch order "
                    "is unsynchronized across processes (deadlock)"
                )

    def put(meta):
        if put_batch is not None:
            meta = put_batch(meta)
        elif sharding is not None:
            meta = jax.device_put(meta, sharding)
        else:
            meta = jax.device_put(meta)
        return jitted(pools, meta)

    return put


def _gather_clips(pool_video, pool_mask, frame_idx, crop_y, crop_x, out_hw):
    """vmapped dynamic-slice crop-gather (uint8 video + uint8 mask)."""
    import jax

    ch, cw = out_hw

    def one_frame(f, y, x):
        v = jax.lax.dynamic_slice(pool_video, (f, y, x, 0), (1, ch, cw, 3))[0]
        m = jax.lax.dynamic_slice(pool_mask, (f, y, x, 0), (1, ch, cw, 1))[0]
        return v, m

    def one_clip(fs, y, x):
        return jax.vmap(lambda f: one_frame(f, y, x))(fs)

    return jax.vmap(one_clip)(frame_idx, crop_y, crop_x)


def assemble_clips_on_device(
    pool_video,  # (F, H, W, 3) uint8
    pool_mask,  # (F, H, W, 1) uint8 in {0, 1}
    frame_idx,  # (B, depth) int32
    crop_y,  # (B,) int32
    crop_x,  # (B,) int32
    valid,  # (B, depth) float32
    out_hw: tuple[int, int],
):
    """On-device clip assembly: (data uint8 (B,d,h,w,3), seg f32 (B,d,h,w)).

    Reproduces the host path exactly: data = video[span][crop] (uint8,
    normalized later in prepare_views), seg = (mask[span][crop] > 0) &
    valid (threshold pre-applied at pool upload).
    """
    import jax.numpy as jnp

    data, mask = _gather_clips(
        pool_video, pool_mask, frame_idx, crop_y, crop_x, out_hw
    )
    seg = mask[..., 0].astype(jnp.float32) * valid[:, :, None, None]
    return data, seg

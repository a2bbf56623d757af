"""Host-side batching + asynchronous device prefetch.

Replaces the reference's torch DataLoader(num_workers=8) pair
(main_ucf101.py:353-374) with:

- `SemiSupervisedBatcher`: per-epoch iterator yielding concatenated
  labeled+unlabeled batches.  Epoch length = number of unlabeled batches;
  the labeled stream cycles (main_ucf101.py:169-178).  The reference's
  in-batch randperm shuffle (main_ucf101.py:73-79) happens here on the
  host — it runs *before* the forward, so shuffling at batch-assembly
  time is mathematically identical (it exists to mix labeled/unlabeled
  rows within BN batch statistics).
- `PrefetchLoader`: a worker-thread pool maps dataset indices to samples,
  a collator stacks them, and finished batches are `jax.device_put` with
  the target sharding ahead of use (double buffering), so H2D transfer
  overlaps the previous step's compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator, Sequence

import numpy as np


def collate(samples: Sequence[dict]) -> dict[str, np.ndarray]:
    out = {}
    for key in samples[0]:
        out[key] = np.stack([s[key] for s in samples])
    return out


class SemiSupervisedBatcher:
    """Yields shuffled labeled+unlabeled batches, one epoch at a time."""

    def __init__(
        self,
        labeled_dataset,
        unlabeled_dataset,
        *,
        batch_size: int,
        seed: int = 0,
        workers: int = 4,
        force_stream_flags: bool = False,
        process_index: int | None = None,
        process_count: int | None = None,
        drop_last: bool = False,
    ):
        """batch_size is the PER-HOST batch.  On multi-host meshes each
        process draws a disjoint strided shard of both datasets
        (process_index/process_count default to jax.process_*)."""
        assert batch_size % 2 == 0, "batch is split half labeled / half unlabeled"
        self.labeled = labeled_dataset
        self.unlabeled = unlabeled_dataset
        self.half = batch_size // 2
        self.seed = seed
        self.workers = workers
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index = process_index
        self.process_count = process_count
        # UCF101 reads labeled_vid from ann[5]; JHMDB has no flag and the
        # reference driver forces ones/zeros per stream (main_jhmdb.py:66-70).
        self.force_stream_flags = force_stream_flags
        # drop_last=False matches the reference DataLoader default
        # (main_ucf101.py:353-374): the final partial unlabeled batch is
        # kept, zero-padded to the compiled batch size, and flagged via
        # the per-row `row_mask` so padded rows drop out of every loss.
        self.drop_last = drop_last
        self._spec = None

    def _acquire_buffers(self) -> dict[str, np.ndarray]:
        """Freshly allocated per-batch arrays for the fill_into path.

        Allocation is cheap; the win of fill_into is skipping the
        per-sample dicts + collate stack + whole-batch permute COPIES,
        not the allocation.  Buffers are deliberately NOT pooled/reused:
        device_put on remote/tunneled attachments may defer the actual
        transfer past the call's return, so overwriting a yielded
        buffer a few batches later both corrupts in-flight data and
        forces the runtime to serialize transfers (a reuse pool
        measured 47 -> 19 clips/s e2e on the tunneled bench host)."""
        if self._spec is None:
            spec = self.unlabeled.batch_spec()
            assert spec == self.labeled.batch_spec(), "dataset spec mismatch"
            self._spec = spec
        bs = 2 * self.half
        return {
            k: np.empty((bs, *shape), dtype)
            for k, (shape, dtype) in self._spec.items()
        }

    def _host_shard(self, order: np.ndarray) -> np.ndarray:
        """Strided per-process shard of a shuffled index order."""
        if self.process_count <= 1:
            return order
        return order[self.process_index :: self.process_count]

    def steps_per_epoch(self) -> int:
        """Identical on every process (collectives would deadlock on a
        per-process step count): computed from the LARGEST strided shard
        (drop_last=False) / the smallest (drop_last=True); short shards
        zero-pad their tail batches via row_mask."""
        n, c = len(self.unlabeled), max(self.process_count, 1)
        if self.drop_last:
            return max((n // c) // self.half, 1)
        longest = -(-n // c)  # ceil: process 0's shard
        return max(-(-longest // self.half), 1)

    def epoch(self, epoch: int) -> Iterator[dict[str, np.ndarray]]:
        # the permutation seed is process-independent: every host shuffles
        # identically, then takes its strided shard (disjoint coverage)
        rng = np.random.default_rng((self.seed, epoch))
        for ds in (self.labeled, self.unlabeled):
            if hasattr(ds, "set_epoch"):
                ds.set_epoch(epoch)

        unlabeled_order = self._host_shard(rng.permutation(len(self.unlabeled)))
        labeled_order = self._host_shard(rng.permutation(len(self.labeled)))
        labeled_pos = 0

        def next_labeled_indices(n):
            nonlocal labeled_pos, labeled_order
            out = []
            while len(out) < n:
                if labeled_pos >= len(labeled_order):
                    labeled_order = self._host_shard(
                        rng.permutation(len(self.labeled))
                    )
                    labeled_pos = 0
                out.append(int(labeled_order[labeled_pos]))
                labeled_pos += 1
            return out

        steps = self.steps_per_epoch()
        # Fast path: datasets expose fill_into (device_prep uint8 layout)
        # -> assemble each permuted row DIRECTLY into a reusable batch
        # buffer (native GIL-releasing crop-gather), skipping per-sample
        # dicts, collate-stack and the whole-batch permute copy.  Bit-
        # identical batches to the slow path (tests/test_loader.py); the
        # slow path remains for the reference float layout.
        fast = getattr(self.labeled, "supports_fill", False) and getattr(
            self.unlabeled, "supports_fill", False
        )
        if fast:
            bs = 2 * self.half
            for step in range(steps):
                u_idx = unlabeled_order[step * self.half : (step + 1) * self.half]
                l_idx = next_labeled_indices(self.half)
                n_real = len(l_idx) + len(u_idx)
                perm = rng.permutation(bs)
                bufs = self._acquire_buffers()
                data, loc = bufs["data"], bufs["loc_msk"]
                mask_cls = bufs.get("mask_cls")
                action = np.zeros((bs,), np.int32)
                label_vid = np.zeros((bs,), np.int32)
                row_mask = np.zeros((bs,), np.float32)
                for i in range(bs):
                    j = int(perm[i])
                    mc = mask_cls[i] if mask_cls is not None else None
                    if j < len(l_idx):
                        a, lv = self.labeled.fill_into(
                            l_idx[j], data[i], loc[i], mc
                        )
                        if self.force_stream_flags:
                            lv = 1
                    elif j < n_real:
                        a, lv = self.unlabeled.fill_into(
                            int(u_idx[j - self.half]), data[i], loc[i], mc
                        )
                        if self.force_stream_flags:
                            lv = 0
                    else:  # zero pad of the ragged final batch
                        data[i][...] = 0
                        loc[i][...] = 0
                        if mc is not None:
                            mc[...] = 0.0
                        a, lv = 0, 0
                    action[i] = a
                    label_vid[i] = lv
                    row_mask[i] = 1.0 if j < n_real else 0.0
                batch = {
                    "data": data,
                    "loc_msk": loc,
                    "action": action,
                    "label_vid": label_vid,
                }
                if mask_cls is not None:
                    batch["mask_cls"] = mask_cls
                batch["row_mask"] = row_mask
                yield batch
            return

        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            for step in range(steps):
                u_idx = unlabeled_order[step * self.half : (step + 1) * self.half]
                l_idx = next_labeled_indices(self.half)
                l_samples = list(pool.map(self.labeled.__getitem__, l_idx))
                u_samples = list(pool.map(self.unlabeled.__getitem__, u_idx))
                if self.force_stream_flags:
                    for s in l_samples:
                        s["label_vid"] = np.int32(1)
                    for s in u_samples:
                        s["label_vid"] = np.int32(0)
                n_real = len(l_samples) + len(u_samples)
                template = (u_samples or l_samples)[0]
                while len(u_samples) < self.half:  # ragged final batch
                    u_samples.append(
                        {k: np.zeros_like(v) for k, v in template.items()}
                    )
                batch = collate(l_samples + u_samples)
                nrows = len(l_samples) + len(u_samples)  # == 2 * self.half
                row_mask = np.zeros((nrows,), np.float32)
                row_mask[:n_real] = 1.0
                batch["row_mask"] = row_mask
                perm = rng.permutation(nrows)
                yield {k: v[perm] for k, v in batch.items()}


class PrefetchLoader:
    """Wraps a batch iterator; moves batches to device ahead of use."""

    def __init__(
        self,
        batch_iterator: Iterator[dict[str, np.ndarray]],
        *,
        sharding=None,
        prefetch: int = 2,
        transform: Callable[[dict], Any] | None = None,
        put_fn: Callable[[dict], Any] | None = None,
    ):
        """put_fn overrides the device placement (e.g. multi-host global
        batch assembly via parallel.mesh.put_global_batch); default is a
        jax.device_put with `sharding`."""
        self.iterator = batch_iterator
        self.sharding = sharding
        self.prefetch = prefetch
        self.transform = transform
        self.put_fn = put_fn

    def __iter__(self):
        import jax

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for batch in self.iterator:
                    if self.transform is not None:
                        batch = self.transform(batch)
                    if self.put_fn is not None:
                        batch = self.put_fn(batch)
                    elif self.sharding is not None:
                        batch = jax.device_put(batch, self.sharding)
                    else:
                        batch = jax.device_put(batch)
                    q.put(batch)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()

"""Micro-probe: the device-cache crop-gather's cost and layout variants.

probe_e2e showed the device-cache train step runs ~8.5 ms/step SLOWER
than the pre-staged-batch step — the on-device clip assembly
(data/device_cache.py assemble_clips_on_device) is the delta, even
though it only moves ~20 MB/step of HBM traffic (~25 us at v5e HBM BW).
Hypothesis: the (F, H, W, 3) uint8 pool layout puts C=3 in the lane
dim, which pads to 128 lanes — every gather reads ~42x the useful
bytes.  Variant B flattens to (F, H, W*3) so the minor dim is
lane-dense and the crop slice stays contiguous (bit-identical output).

Usage: python tools/probe_gather.py [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BS, DEPTH, CH, CW = 8, 8, 224, 224
F, H, W = 660, 256, 256  # ~ bench pool: 2*16 videos x 40 frames + zero slot


def current(pool_video, pool_mask, frame_idx, crop_y, crop_x, valid):
    from picad_tpu.data.device_cache import assemble_clips_on_device

    return assemble_clips_on_device(
        pool_video, pool_mask, frame_idx, crop_y, crop_x, valid, (CH, CW)
    )


def flat_variant(pool_video_flat, pool_mask_flat, frame_idx, crop_y, crop_x,
                 valid):
    """(F, H, W*3) video + (F, H, W) mask pools; contiguous lane-dense
    slices; output identical to `current`."""

    def one_frame(f, y, x3, x):
        v = jax.lax.dynamic_slice(
            pool_video_flat, (f, y, x3), (1, CH, CW * 3)
        )[0].reshape(CH, CW, 3)
        m = jax.lax.dynamic_slice(pool_mask_flat, (f, y, x), (1, CH, CW))[0]
        return v, m

    def one_clip(fs, y, x):
        return jax.vmap(lambda f: one_frame(f, y, x * 3, x))(fs)

    data, mask = jax.vmap(one_clip)(frame_idx, crop_y, crop_x)
    seg = mask.astype(jnp.float32) * valid[:, :, None, None]
    return data, seg


def time_fn(fn, args, iters):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rng = np.random.default_rng(0)
    pool_video = jax.device_put(
        rng.integers(0, 256, (F, H, W, 3), dtype=np.uint8))
    pool_mask = jax.device_put(
        (rng.random((F, H, W, 1)) > 0.7).astype(np.uint8))
    pv_flat = jax.device_put(np.asarray(pool_video).reshape(F, H, W * 3))
    pm_flat = jax.device_put(np.asarray(pool_mask).reshape(F, H, W))
    frame_idx = jax.device_put(
        rng.integers(0, F, (BS, DEPTH)).astype(np.int32))
    crop_y = jax.device_put(rng.integers(0, H - CH, (BS,)).astype(np.int32))
    crop_x = jax.device_put(rng.integers(0, W - CW, (BS,)).astype(np.int32))
    valid = jax.device_put(np.ones((BS, DEPTH), np.float32))

    dt_a, out_a = time_fn(
        current, (pool_video, pool_mask, frame_idx, crop_y, crop_x, valid),
        iters)
    print(f"A current (F,H,W,3) : {dt_a * 1e3:7.3f} ms", flush=True)
    dt_b, out_b = time_fn(
        flat_variant, (pv_flat, pm_flat, frame_idx, crop_y, crop_x, valid),
        iters)
    print(f"B flat (F,H,W*3)    : {dt_b * 1e3:7.3f} ms", flush=True)
    np.testing.assert_array_equal(np.asarray(out_a[0]), np.asarray(out_b[0]))
    np.testing.assert_array_equal(np.asarray(out_a[1]), np.asarray(out_b[1]))
    print(f"outputs identical; B is {dt_a / dt_b:.1f}x faster")


if __name__ == "__main__":
    main()

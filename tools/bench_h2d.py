"""One-number H2D link probe: what ceiling does the host->device link
put on the STREAMING input pipeline?

The streaming fallback (data/loader.py + device_put) is link-bound:

    stream_ceiling_clips_per_s ~= link_MBps * bs / batch_MB

where batch_MB is the uint8 pixel batch (bs x 8 x H x W x 3 plus the
mask).  bench.py measures the same rate inline; this standalone probe
exists so an operator on a PCIe-attached TPU host (which this project
has never had — every measured number is from a tunneled attachment at
~8-150 MB/s) can bound the streaming path with one command and no
dataset.

Usage:  python tools/bench_h2d.py [--bs 8] [--hw 224] [--reps 8]
Prints one JSON line: measured link MB/s + the implied streaming
ceiling at the bench configuration.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--hw", type=int, default=224)
    p.add_argument("--reps", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    # the production streaming layout: uint8 pixels + uint8 masks
    pixels = rng.integers(
        0, 256, (args.bs, 8, args.hw, args.hw, 3), dtype=np.uint8
    )
    mask = rng.integers(0, 2, (args.bs, 8, args.hw, args.hw, 1), dtype=np.uint8)
    batch_bytes = pixels.nbytes + mask.nbytes

    def put_once() -> float:
        t0 = time.perf_counter()
        d = jax.device_put(pixels)
        m = jax.device_put(mask)
        # force completion with a value fetch — block_until_ready has
        # proven unreliable on tunneled attachments
        float(jnp.sum(d[0, 0, 0, 0]) + jnp.sum(m[0, 0, 0, 0]))
        return time.perf_counter() - t0

    put_once()  # warm allocator/handshake
    times = [put_once() for _ in range(args.reps)]
    best = min(times)  # min = least interference; the link's capability
    mbps = batch_bytes / 1e6 / best
    ceiling = mbps * 1e6 / batch_bytes * args.bs  # clips/s at this batch
    print(json.dumps({
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "batch_mb": round(batch_bytes / 1e6, 2),
        "h2d_link_mbps": round(mbps, 1),
        "stream_ceiling_clips_per_sec": round(ceiling, 1),
        "median_mbps": round(
            batch_bytes / 1e6 / sorted(times)[len(times) // 2], 1
        ),
        "note": "ceiling ~= link_MBps * bs / batch_MB; compare with "
                "bench.py's stream_e2e_clips_per_sec_per_chip",
    }))


if __name__ == "__main__":
    main()

"""PrefetchLoader: ordering, completeness, transform hook."""

import numpy as np

from picad_tpu.data.loader import PrefetchLoader


def test_prefetch_loader_preserves_order_and_count():
    batches = [{"x": np.full((2, 3), i, np.float32)} for i in range(7)]
    out = list(PrefetchLoader(iter(batches), prefetch=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_prefetch_loader_transform():
    batches = [{"x": np.ones((2,), np.float32)} for _ in range(3)]
    loader = PrefetchLoader(
        iter(batches), prefetch=1,
        transform=lambda b: {"x": b["x"] * 2.0},
    )
    for b in loader:
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2,), 2.0))

"""ctypes bindings for the native clip-preprocessing library.

Loads native/libclip_ops.so if present (built by `make -C native`);
callers fall back to the numpy path when unavailable, so the framework
works without a compiled artifact (e.g. fresh checkouts).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "native", "libclip_ops.so")


def load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_lib()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.assemble_clip.argtypes = [
        u8p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64,
        i64p, u8p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        f32p, f32p, f32p,
    ]
    lib.assemble_clip.restype = None
    lib.rasterize_boxes.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p, ctypes.c_int64,
    ]
    lib.rasterize_boxes.restype = None
    lib.crop_gather_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64,
        i64p, u8p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.crop_gather_u8.restype = None
    _LIB = lib
    return lib


def available() -> bool:
    return load_library() is not None


def assemble_clip(
    video: np.ndarray,
    mask: np.ndarray | None,
    span: np.ndarray,
    valid: np.ndarray,
    y0: int,
    x0: int,
    ch: int,
    cw: int,
):
    """Fused crop + /255 + flip + mask threshold (see native/clip_ops.cc)."""
    lib = load_library()
    assert lib is not None
    depth = len(span)
    video = np.ascontiguousarray(video, dtype=np.uint8)
    F, H, W, _ = video.shape
    out = np.empty((depth, ch, cw, 3), np.float32)
    out_flip = np.empty((depth, ch, cw, 3), np.float32)
    out_mask = np.empty((depth, ch, cw, 1), np.float32)
    span = np.ascontiguousarray(span, dtype=np.int64)
    valid = np.ascontiguousarray(valid, dtype=np.uint8)
    mask_ptr = None
    if mask is not None:
        mask = np.ascontiguousarray(mask.reshape(F, H, W), dtype=np.uint8)
        mask_ptr = mask.ctypes.data_as(ctypes.c_void_p)
    lib.assemble_clip(
        video, mask_ptr, H, W, span, valid, depth, y0, x0, ch, cw,
        out, out_flip, out_mask.reshape(depth, ch, cw),
    )
    return out, out_flip, out_mask


def crop_gather_u8(
    video: np.ndarray,
    mask: np.ndarray | None,
    span: np.ndarray,
    valid: np.ndarray,
    y0: int,
    x0: int,
    out_data: np.ndarray,  # (depth, ch, cw, 3) uint8, C-contiguous view
    out_mask: np.ndarray,  # (depth, ch, cw, 1) uint8, C-contiguous view
) -> None:
    """Batched-slot uint8 crop-gather (see native/clip_ops.cc).

    Writes straight into preallocated batch-slot views; the ctypes call
    releases the GIL, so assembly overlaps step dispatch."""
    lib = load_library()
    assert lib is not None
    depth, ch, cw, _ = out_data.shape
    assert video.dtype == np.uint8 and video.flags.c_contiguous
    assert out_data.flags.c_contiguous and out_mask.flags.c_contiguous
    _, H, W, _ = video.shape
    span = np.ascontiguousarray(span, dtype=np.int64)
    valid = np.ascontiguousarray(valid, dtype=np.uint8)
    mask_ptr = None
    if mask is not None:
        assert mask.dtype == np.uint8 and mask.flags.c_contiguous
        mask_ptr = ctypes.c_void_p(mask.ctypes.data)
    lib.crop_gather_u8(
        ctypes.c_void_p(video.ctypes.data), mask_ptr, H, W,
        span, valid, depth, y0, x0, ch, cw,
        ctypes.c_void_p(out_data.ctypes.data),
        ctypes.c_void_p(out_mask.ctypes.data),
    )

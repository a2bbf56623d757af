"""Width-packed 3-D convolution: full-lane MXU work for 64-channel convs.

The decoder/skip convs (conv112/conv56: 3x3x3 SAME, 64 output channels
— models/capsules_ucf101.py:358-366) keep only 64 of the MXU's 128
lanes busy, and the round-3 device trace shows their in-context
gradient fusions at ~3-8% MFU (e.g. the conv112 input-grad fusion at
~11 ms for ~0.2 TFLOP).  Space-to-depth on the W axis packs two
adjacent columns into the channel dim — (B, T, H, W, C) ->
(B, T, H, W/2, 2C) — turning the 3x3x3 conv into a 3x3x3 conv over
128 channels whose kernel is BLOCK-SPARSE:

    out col 2w+p reads in cols 2w+p-1 .. 2w+p+1, i.e. packed words
    w-1..w+1 with a fixed (parity-in, parity-out) block pattern —
    10 of the 18 (mw', pin, p) blocks are zero.

We materialize the packed kernel DENSE (scatter the logical (C, C)
blocks into (3, 3, 3, 2C, 2C) zeros at trace time — differentiable,
parameter-sized): 2x the logical FLOPs arithmetically, but every lane
is busy and XLA tiles a 128->128 conv ~an order of magnitude better
than a 64->64 one.  Padding: SAME on the packed width equals SAME on
the original width for even W (the packed zero word w=-1 covers
original columns -2,-1 of which only -1 is ever read — by a zero
kernel block otherwise).

Exactness: every output element is the same sum of the same products
(plus explicit zero blocks), so values and gradients match the direct
conv to float reassociation only.

Gated behind PICAD_WPACK=1 — MEASURED AND REJECTED in-context: the
hardware A/B (tools/ab_tapconv.py --wpack, v5e, 2026-08-18) timed the
full train step at 83.96 ms width-packed vs 77.64 ms direct
(-6.3 ms/step).  The pack/unpack reshapes around each conv cost more
than the half-empty lanes they fill; XLA's own layout choices win.
Tested for value/gradient parity either way.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from picad_tpu.ops.convops import conv_nd

_ENABLED = os.environ.get("PICAD_WPACK", "0") == "1"


def pack_kernel(k: jax.Array) -> jax.Array:
    """(3, 3, 3, Ci, Co) logical kernel -> (3, 3, 3, 2Ci, 2Co) packed.

    Block (mw', pin, p) holds k[:, :, mw] where the original W tap mw
    satisfies: input col = 2w + p + mw - 1 = 2*(w + mw' - 1) + pin.
    """
    kt, kh, kw, ci, co = k.shape
    assert (kt, kh, kw) == (3, 3, 3), "width packing is for 3x3x3 kernels"
    kp = jnp.zeros((3, 3, 3, 2 * ci, 2 * co), k.dtype)
    for mw in range(3):
        for p in range(2):  # output parity
            col = p + mw - 1  # input col relative to packed word 2w
            wprime, pin = divmod(col, 2)
            kp = kp.at[
                :, :, wprime + 1,
                pin * ci:(pin + 1) * ci,
                p * co:(p + 1) * co,
            ].set(k[:, :, mw])
    return kp


def conv3d_same_wpacked(x: jax.Array, k: jax.Array) -> jax.Array:
    """3x3x3 SAME conv, channels-last, via width packing (exact)."""
    b, t, h, w, ci = x.shape
    assert w % 2 == 0, "width packing needs even W"
    co = k.shape[-1]
    xp = x.reshape(b, t, h, w // 2, 2 * ci)
    yp = conv_nd(xp, pack_kernel(k), 1, "SAME")
    return yp.reshape(b, t, h, w, co)


def decoder_conv3d(x: jax.Array, k: jax.Array) -> jax.Array:
    """Dispatch for the decoder 3x3x3 SAME convs: width-packed on TPU
    when enabled (full-lane MXU work), the direct conv otherwise."""
    if (
        _ENABLED
        and jax.default_backend() == "tpu"
        and k.shape[:3] == (3, 3, 3)
        and x.shape[3] % 2 == 0
        and k.shape[-1] <= 64  # only under-laned OUTPUTS benefit
    ):
        return conv3d_same_wpacked(x, k)
    return conv_nd(x, k, 1, "SAME")

"""Exact Pallas tap-GEMM kernels for stride-1 VALID 2-D convolutions.

Built for the PrimaryCaps 9x9 convs (models/capsules_ucf101.py:33-41:
two VALID convs over the (B, 28, 28, 832) Mixed_4f map).  Reformulated
as 81 full-width MXU GEMMs per direction, the family is pure matmul at
MXU-native shapes (M~12.5k, K=832, N up to 544).

History of the motivating claim: an early-round-3 trace attributed
~42 ms of a ~73 ms step to this family (fwd ~10 / dx ~19 / dW ~13 ms),
which is what justified building these kernels — but the full-step
hardware A/B then REJECTED them (-9.2 ms, see _ENABLED below), and the
round-4 trace of the final step shows the family's fused ops at roughly
fwd ~2.9 / dx ~5.0 / dW ~3.1 ms ≈ 11 ms/step (tools/trace_step.py;
attribution is approximate because XLA fuses neighbors into these ops).
The two findings are consistent: the early trace misattributed fused
neighbor work to the conv family, and XLA's in-context conv fusions
run it far closer to the achievable rate than the 8-24%-MFU story
suggested.  The kernels stay as a correctness-validated reference
formulation and a bound on what a standalone-GEMM rewrite can give.

The formulation — "flat tap GEMMs":

Flatten x to (M, Ci) with M = B*H*W row-major.  For tap t = (dy, dx)
let off = dy*W + dx.  Then a VALID conv is

    out[m] += x[m + off] @ W[t]          (m enumerates the B*H*W canvas)

where out rows with y >= HO or x >= WO are garbage that a final crop
drops.  The shift never crosses a sample boundary inside the valid
region: for valid rows m_local <= (HO-1)*W + WO-1, m_local + off <=
H*W - 1.  The gradients use the same identity:

    dx[m]  = sum_t gcan[m - off(t)] @ W[t]^T      (gcan = g zero-embedded
                                                   into the (B, H, W) canvas)
    dW[t]  = sum_m x[m + off(t)] (x) gcan[m]

both exact for the same reason — every out-of-range or cross-sample
read lands on an explicit zero row of the canvas.

TPU mechanics (fwd/dx — the chunk-grid kernels):

- grid = (M-chunks,); every tap offset is a COMPILE-TIME constant, so
  the 81 tap GEMMs per chunk are static even-row slices of a slab that
  accumulate in registers — no psum HBM/VMEM round-trips (a v1 design
  with grid=(ntaps,) paid an accumulator RMW per (tap, chunk)), and no
  dynamic slicing at all.
- The slab is blocks (c, c+1) of the flat rows (the caller end/front-
  extends by one zero chunk), delivered as ordinary ALIGNED BlockSpec
  blocks — dense (8,128) tiling, dense loads.  A v1 design that read
  dynamic-offset slabs through a degenerate (rows, 1, C)-tiled layout
  (the fused-head-backward trick) measured ~2x slower than the GEMMs
  alone: degenerate-layout vector loads, not arithmetic, dominated.
- 16-bit rows sublane-pack (2,1), making odd-row static slices illegal;
  PAIRS of rows are packed into i32 words XLA-side
  (lax.bitcast_convert_type) in BOTH alignments, and one
  pltpu.bitcast per plane per chunk unpacks the slab in-VMEM — odd
  shifts become even slices of the odd-aligned plane.
- The weight-grad kernel keeps the v1 structure (grid=(ntaps,), tap
  offsets are grid indices → dynamic untiled-dim slices through a
  (pairs, rows, 1, C) layout), since its 81 accumulators cannot all be
  VMEM-resident; its psum per tap is small, so only the slab-load cost
  applies.

Dispatch: `tap_conv_valid` uses the kernels on TPU when PICAD_TAPCONV=1
and the shape gate passes, and falls back to the literal lax conv
elsewhere — both paths produce identical math (f32: bit-identical
contraction per tap; the tap-sum order differs from XLA's internal conv
accumulation by normal float reassociation only).
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from picad_tpu.ops.convops import conv_nd

_CHUNK = 512  # bf16 rows per in-body GEMM chunk (256 i32 words)

# Dispatch switch: "1" = use the Pallas kernels on TPU, "0" = always the
# XLA conv.  Defaults OFF — MEASURED AND REJECTED in-context: the
# hardware A/B (tools/ab_tapconv.py, v5e, 2026-08-18) timed the full
# train step at 86.88 ms with the v2 chunk-grid kernels vs 77.64 ms on
# the XLA conv fusions (-9.2 ms/step).  The v2 rewrite did fix the v1
# slab-load pathology, but XLA's fused 9x9 conv family is still faster
# in-context; the kernels stay as a correctness-validated reference for
# stride-1 VALID tap-GEMM convs.  Flip with PICAD_TAPCONV=1.
import os

_ENABLED = os.environ.get("PICAD_TAPCONV", "0") == "1"
# chunk-size override for on-hardware tuning (tools/ab_tapconv.py)
_CHUNK = int(os.environ.get("PICAD_TAPCONV_CHUNK", _CHUNK))
# weight-grad kernel variant: "v1" (degenerate-layout, known to compile)
# or "dense" (dynamic tiled-dim slices; Mosaic acceptance untested)
_DW_VARIANT = os.environ.get("PICAD_TAPCONV_DW", "v1")


def _dot_precision(dtype):
    """16-bit operands contract at DEFAULT precision: an ambient
    `highest` (tests/conftest.py) asks Mosaic for a multi-pass bf16
    emulation it rejects ("Bad lhs type"); accumulation is f32 anyway
    via preferred_element_type.  32-bit operands inherit ambient."""
    return (
        jax.lax.Precision.DEFAULT
        if jnp.dtype(dtype).itemsize == 2
        else None
    )


def _pack_rows(flat: jax.Array, front_pad: int, end_pad: int, *, forward: bool):
    """(M, C) 16/32-bit -> (pairs, rows, 1, C) 32-bit HBM layout for the
    DYNAMIC-offset kernels (the weight-grad kernel, whose tap offsets are
    grid indices).

    For 16-bit dtypes returns both pair-alignments of the row packing —
    index 0 packs rows (2s, 2s+1); index 1 is offset by one row so that
    an ODD row shift becomes an even word shift:
      forward=True  (kernels read flat[m + off]): odd[i] = flat[i + 1],
        word s holds (flat[2s+1], flat[2s+2]);
      forward=False (kernels read flat[m - off]): odd[i] = flat[i - 1],
        word s holds (flat[2s-1], flat[2s]).
    front_pad/end_pad zero rows (even counts) keep every slice in
    bounds.  32-bit dtypes need no packing: returns (1, rows, 1, C).
    """
    M, C = flat.shape
    assert front_pad % 2 == 0 and end_pad % 2 == 0
    itemsize = flat.dtype.itemsize
    if itemsize == 4:
        rows = jnp.pad(flat, ((front_pad, end_pad), (0, 0)))
        return rows.reshape(1, M + front_pad + end_pad, 1, C), flat.dtype
    assert itemsize == 2, flat.dtype
    i32 = jnp.int32
    even = jnp.pad(flat, ((front_pad, end_pad + 2), (0, 0)))
    if forward:
        assert front_pad == 0, "forward packing assumes no front pad"
        odd = jnp.pad(flat[1:], ((0, end_pad + 3), (0, 0)))
    else:
        odd = jnp.pad(flat, ((front_pad + 1, end_pad + 1), (0, 0)))
    n2 = (M + front_pad + end_pad + 2) // 2

    def pack(a):
        a = a.reshape(n2, 2, C).swapaxes(1, 2)  # (n2, C, 2)
        return lax.bitcast_convert_type(a, i32)  # (n2, C)

    return jnp.stack([pack(even), pack(odd)]).reshape(2, n2, 1, C), flat.dtype


def _pack2(flat: jax.Array, *, forward: bool):
    """(R, C) -> DENSE (pairs, words, C) for the chunk-grid kernels.

    16-bit: two pair-alignments packed into i32 words (see _pack_rows for
    the alignment convention); R must be even.  32-bit: (1, R, C) as-is.
    The chunk-grid kernels only ever slice `words` on BlockSpec
    boundaries (aligned), so no dummy tile dim is needed — blocks stay
    (8,128)-tiled and in-kernel loads are dense.
    """
    R, C = flat.shape
    itemsize = flat.dtype.itemsize
    if itemsize == 4:
        return flat.reshape(1, R, C)
    assert itemsize == 2 and R % 2 == 0, (flat.dtype, R)
    even = flat
    if forward:
        odd = jnp.pad(flat[1:], ((0, 1), (0, 0)))
    else:
        odd = jnp.pad(flat[:-1], ((1, 0), (0, 0)))

    def pack(a):
        a = a.reshape(R // 2, 2, C).swapaxes(1, 2)
        return lax.bitcast_convert_type(a, jnp.int32)  # (R//2, C)

    return jnp.stack([pack(even), pack(odd)])  # (2, R//2, C)


def _slab(ref, pair, start, nrows, dtype):
    """Load `nrows` (compute-dtype) rows at dynamic row offset `start`
    from a packed (pairs, rows, 1, C) i32/f32 ref; returns (nrows, C)."""
    if dtype.itemsize == 4:
        return ref[0, pl.ds(start, nrows), 0, :]
    words = ref[pair, pl.ds(start, nrows // 2), 0, :]
    return pltpu.bitcast(words, dtype)


def _tap_off(t, kdims, strides):
    """Flat row shift of a (dynamic, grid-index) tap t: unravel t over
    the kernel dims (row-major) and contract with the flat row strides.
    Returns (off, pair, word) for packed-pair addressing."""
    off = None
    rem = t
    n = len(kdims)
    for i in range(n):
        trailing = 1
        for k in kdims[i + 1:]:
            trailing *= k
        idx = rem // trailing if trailing > 1 else rem
        rem = lax.rem(rem, trailing) if trailing > 1 else rem * 0
        term = idx * strides[i]
        off = term if off is None else off + term
    pair = lax.rem(off, 2)
    word = off // 2
    return off, pair, word


def _unpack_slab(cur_ref, nxt_ref, dtype):
    """Two consecutive (pairs, cm_w, C) blocks -> per-alignment compute-
    dtype slabs of 2*cm rows (ONE bitcast per plane per chunk)."""
    if dtype.itemsize == 4:
        slab = jnp.concatenate([cur_ref[0], nxt_ref[0]], axis=0)
        return slab, slab
    ea = pltpu.bitcast(
        jnp.concatenate([cur_ref[0], nxt_ref[0]], axis=0), dtype
    )
    ob = pltpu.bitcast(
        jnp.concatenate([cur_ref[1], nxt_ref[1]], axis=0), dtype
    )
    return ea, ob


def _chunk_kernel(offsets, cm, dtype, back_shift,
                  cur_ref, nxt_ref, w_ref, out_ref):
    """One output chunk of a tap-GEMM conv; taps are a STATIC loop
    accumulating in registers (no psum round-trips, no dynamic slices).

    `offsets` are the flat row shifts of the taps (any spatial rank —
    sum of per-dim tap index times row stride), compile-time constants.
    Forward (back_shift=0):    out[m] reads slab row (m - c*cm) + off(t)
    Backward (back_shift=cm):  out[m] reads slab row (m - c*cm) + cm - off(t)
    where slab = packed blocks c, c+1 (the backward caller front-extends
    the rows by one zero chunk): static even-row slices of the
    once-per-chunk unpacked slab.  W is (ntaps, Co, Ci), resident;
    forward contracts its lane dim (transpose_rhs), backward its
    sublane dim.
    """
    ea, ob = _unpack_slab(cur_ref, nxt_ref, dtype)
    contract = ((1,), (1,)) if back_shift == 0 else ((1,), (0,))
    acc = None
    for t, off in enumerate(offsets):
        idx = (back_shift - off) if back_shift else off
        if dtype.itemsize == 4 or idx % 2 == 0:
            sub = ea[idx:idx + cm]
        else:
            # ob row r = flat[r + 1] (forward packing) / flat[r - 1]
            # (backward packing): the start index becomes even
            s0 = idx - 1 if back_shift == 0 else idx + 1
            sub = ob[s0:s0 + cm]
        p = jax.lax.dot_general(
            sub, w_ref[t],
            dimension_numbers=(contract, ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dtype),
        )
        acc = p if acc is None else acc + p
    out_ref[...] = acc


def _dw_kernel(nchunks, kdims, strides, cm, dtype, x_ref, g_ref, dw_ref):
    """dW[t] = sum_m x[m + off(t)] (x) gcan[m]; grid=(ntaps,)."""
    t = pl.program_id(0)
    _, pair, word = _tap_off(t, kdims, strides)
    acc = None
    for c in range(nchunks):
        if dtype.itemsize == 4:
            xs = _slab(x_ref, 0, c * cm + (word * 2 + pair), cm, dtype)
            gs = _slab(g_ref, 0, c * cm, cm, dtype)
        else:
            xs = _slab(x_ref, pair, c * (cm // 2) + word, cm, dtype)
            gs = _slab(g_ref, 0, c * (cm // 2), cm, dtype)
        p = jax.lax.dot_general(
            xs, gs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dtype),
        )
        acc = p if acc is None else acc + p
    dw_ref[0] = acc


def _dw_kernel_dense(nchunks, kdims, strides, cm, dtype, x_ref, g_ref,
                     dw_ref):
    """dW via DENSE resident arrays + dynamic word slices.

    Same math as _dw_kernel, but x/g cross as normally-tiled
    (pairs, words, C) blocks and the per-tap slabs are dynamic
    second-minor slices of the resident VMEM refs.  Whether Mosaic
    accepts dynamic unaligned slices on a tiled dim (it provably does
    on UNTILED dims, which is what the degenerate-layout v1 exploits)
    is a hardware question — selected via PICAD_TAPCONV_DW=dense for
    the A/B; the v1 degenerate-layout kernel stays the default.
    """
    t = pl.program_id(0)
    _, pair, word = _tap_off(t, kdims, strides)
    acc = None
    for c in range(nchunks):
        if dtype.itemsize == 4:
            xs = x_ref[0, pl.ds(c * cm + word * 2 + pair, cm), :]
            gs = g_ref[0, c * cm:(c + 1) * cm, :]
        else:
            xs = pltpu.bitcast(
                x_ref[pair, pl.ds(c * (cm // 2) + word, cm // 2), :], dtype
            )
            gs = pltpu.bitcast(
                g_ref[0, c * (cm // 2):(c + 1) * (cm // 2), :], dtype
            )
        p = jax.lax.dot_general(
            xs, gs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dtype),
        )
        acc = p if acc is None else acc + p
    dw_ref[0] = acc


def _vmem_params():
    return pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _pad_rows_to(flat, mult):
    m = flat.shape[0]
    mp = -(-m // mult) * mult
    if mp != m:
        flat = jnp.pad(flat, ((0, mp - m), (0, 0)))
    return flat


def _spatial(x_shape, kshape):
    """(B, spatial dims, strides, kernel dims, flat offsets, out dims)."""
    B = x_shape[0]
    sp = tuple(x_shape[1:-1])
    kd = tuple(kshape[:-2])
    strides = []
    acc = 1
    for d in reversed(sp):
        strides.append(acc)
        acc *= d
    strides = tuple(reversed(strides))  # row strides of the flat canvas
    offsets = []
    for tap in itertools.product(*(range(k) for k in kd)):
        offsets.append(sum(i * s for i, s in zip(tap, strides)))
    out_dims = tuple(d - k + 1 for d, k in zip(sp, kd))
    return B, sp, strides, kd, tuple(offsets), out_dims


def _fwd_impl(x, w, *, interpret=False):
    B, sp, strides, kd, offsets, od = _spatial(x.shape, w.shape)
    Ci, Co = w.shape[-2], w.shape[-1]
    dtype = x.dtype
    M = B
    for d in sp:
        M *= d
    cm = _CHUNK
    assert max(offsets) <= cm - 2, "tap shifts exceed slab"
    flat = _pad_rows_to(x.reshape(M, Ci), cm)
    Mp = flat.shape[0]
    nb = Mp // cm
    # one extra zero chunk so every grid step can read blocks (c, c+1)
    flat = jnp.pad(flat, ((0, cm), (0, 0)))
    packed = _pack2(flat, forward=True)
    div = 2 if dtype.itemsize == 2 else 1
    cw = cm // div
    ntaps = len(offsets)
    # W stored (ntaps, Co, Ci): forward contracts the Ci lane dim
    # (transpose_rhs), so only Ci pays lane padding
    wt = w.reshape(ntaps, Ci, Co).swapaxes(1, 2).astype(dtype)
    out = pl.pallas_call(
        functools.partial(
            _chunk_kernel, offsets, cm, jnp.dtype(dtype), 0
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((packed.shape[0], cw, Ci), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((packed.shape[0], cw, Ci), lambda c: (0, c + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wt.shape, lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cm, Co), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Co), jnp.float32),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(packed, packed, wt)
    out = out[:M].reshape(B, *sp, Co)
    crop = (slice(None),) + tuple(slice(0, o) for o in od)
    return out[crop].astype(dtype)


def _dx_impl(g, w, x_shape, *, interpret=False):
    """g: (B, *out_dims, Co) cotangent -> dx (B, *spatial, Ci)."""
    B, sp, strides, kd, offsets, od = _spatial(x_shape, w.shape)
    Ci, Co = w.shape[-2], w.shape[-1]
    dtype = g.dtype
    gcan = jnp.pad(
        g,
        ((0, 0),) + tuple((0, d - o) for d, o in zip(sp, od)) + ((0, 0),),
    )
    M = B
    for d in sp:
        M *= d
    cm = _CHUNK
    assert max(offsets) <= cm - 2, "tap shifts exceed slab"
    flat = _pad_rows_to(gcan.reshape(M, Co), cm)
    Mp = flat.shape[0]
    nb = Mp // cm
    # front-extend by one zero chunk: out chunk c reads extended blocks
    # (c, c+1), i.e. rows [c*cm - cm, (c+1)*cm) of gcan — covering every
    # backward shift up to cm
    flat = jnp.pad(flat, ((cm, 0), (0, 0)))
    packed = _pack2(flat, forward=False)
    div = 2 if dtype.itemsize == 2 else 1
    cw = cm // div
    ntaps = len(offsets)
    wt = w.reshape(ntaps, Ci, Co).swapaxes(1, 2).astype(dtype)
    dx = pl.pallas_call(
        functools.partial(
            _chunk_kernel, offsets, cm, jnp.dtype(dtype), cm
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((packed.shape[0], cw, Co), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((packed.shape[0], cw, Co), lambda c: (0, c + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wt.shape, lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cm, Ci), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Ci), jnp.float32),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(packed, packed, wt)
    return dx[:M].reshape(B, *sp, Ci).astype(dtype)


def _dw_impl(x, g, kshape, *, interpret=False):
    """dW[t] from x and the zero-embedded cotangent canvas; f32 out."""
    B, sp, strides, kd, offsets, od = _spatial(x.shape, kshape)
    Ci, Co = kshape[-2], kshape[-1]
    dtype = x.dtype
    gcan = jnp.pad(
        g,
        ((0, 0),) + tuple((0, d - o) for d, o in zip(sp, od)) + ((0, 0),),
    )
    M = B
    for d in sp:
        M *= d
    cm = _CHUNK
    xf = _pad_rows_to(x.reshape(M, Ci), cm)
    gf = _pad_rows_to(gcan.reshape(M, Co), cm)
    Mp = xf.shape[0]
    nchunks = Mp // cm
    tmax = max(offsets)
    ntaps = len(offsets)
    if _DW_VARIANT == "dense":
        pad = tmax + 2 + (tmax & 1)
        xp = _pack2(jnp.pad(xf, ((0, pad + (pad & 1)), (0, 0))), forward=True)
        gp = _pack2(jnp.pad(gf, ((0, 2), (0, 0))), forward=True)
        kern = functools.partial(
            _dw_kernel_dense, nchunks, kd, strides, cm, jnp.dtype(dtype)
        )
        specs3 = True
    else:
        xp, _ = _pack_rows(xf, 0, tmax + 2 + (tmax & 1), forward=True)
        gp, _ = _pack_rows(gf, 0, 2, forward=True)
        kern = functools.partial(
            _dw_kernel, nchunks, kd, strides, cm, jnp.dtype(dtype)
        )
        specs3 = False
    idx3 = (lambda t: (0, 0, 0)) if specs3 else (lambda t: (0, 0, 0, 0))
    dw = pl.pallas_call(
        kern,
        grid=(ntaps,),
        in_specs=[
            pl.BlockSpec(xp.shape, idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec(gp.shape, idx3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ci, Co), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntaps, Ci, Co), jnp.float32),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(xp, gp)
    return dw.reshape(*kd, Ci, Co)


def _use_pallas(x_shape, kshape, dtype) -> bool:
    """Gate: enabled, TPU, 16-bit, even flat M, VMEM headroom, MXU-sized."""
    if not _ENABLED:
        return False
    if jax.default_backend() != "tpu":
        return False
    if len(x_shape) != len(kshape) or len(x_shape) < 4:
        return False
    B, sp, strides, kd, offsets, od = _spatial(x_shape, kshape)
    Ci, Co = kshape[-2], kshape[-1]
    if any(d < k for d, k in zip(sp, kd)):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    # PRODUCTION (16-bit) dtypes only: f32 model paths stay on the XLA
    # conv, the golden-parity baseline (the tap-major accumulation order
    # perturbs f32 results at the reassociation level, which the
    # EM-routing cost_std quirk amplifies past golden tolerances).  The
    # f32 kernels remain covered by the interpret-mode oracle tests.
    if itemsize != 2:
        return False
    M = B
    for d in sp:
        M *= d
    if M % 2:
        return False
    Mp = -(-M // _CHUNK) * _CHUNK
    lanes = -(-max(Ci, Co) // 128) * 128
    # resident packed input (+ pair copy for 16-bit) + f32 accumulator
    resident = 2 * Mp * lanes * itemsize + Mp * lanes * 4
    if resident > 90 * 1024 * 1024:
        return False
    # every tap shift must fit inside the one-chunk slab extension
    if max(offsets) > _CHUNK - 2:
        return False
    # the kernels only help when the tap GEMMs are MXU-sized
    if M < 4096 or Ci < 128 or len(offsets) < 9:
        return False
    return True


# public alias: bench.py queries whether the kernels would dispatch for
# a given problem before crediting their analytic FLOPs (XLA's cost model
# counts Pallas custom-calls as 0; crediting a path that did NOT run
# inflates MFU — the round-3 bench made exactly that mistake)
kernels_active = _use_pallas


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def tap_conv_valid(x: jax.Array, w: jax.Array, interpret: bool = False):
    """Stride-1 VALID conv (B, *spatial, Ci) * (*k, Ci, Co), channels-last,
    any spatial rank (the flat-canvas tap identity is rank-agnostic).

    Pallas tap-GEMM kernels on TPU (exact; see module docstring), literal
    lax conv elsewhere.  Gradients are defined for x and w.
    """
    if interpret or _use_pallas(x.shape, w.shape, x.dtype):
        return _fwd_impl(x, w.astype(x.dtype), interpret=interpret)
    return conv_nd(x, w.astype(x.dtype), 1, "VALID")


def _tap_fwd(x, w, interpret):
    return tap_conv_valid(x, w, interpret), (x, w)


def _tap_bwd(interpret, res, g):
    x, w = res
    g = g.astype(x.dtype)
    if interpret or _use_pallas(x.shape, w.shape, x.dtype):
        dx = _dx_impl(g, w.astype(x.dtype), x.shape, interpret=interpret)
        dw = _dw_impl(x, g, w.shape, interpret=interpret)
        return dx, dw.astype(w.dtype)
    # XLA fallback: dgrad as a flipped full conv; wgrad as a conv over
    # the batch dim (the standard transposes), any spatial rank.
    n = x.ndim - 2
    kd = w.shape[:n]
    spatial = tuple(range(n))
    wf = jnp.flip(w.astype(x.dtype), axis=spatial).swapaxes(n, n + 1)
    dx = conv_nd(g, wf, 1, [(k - 1, k - 1) for k in kd])
    perm_x = (x.ndim - 1,) + tuple(range(1, x.ndim - 1)) + (0,)
    perm_g = tuple(range(1, x.ndim - 1)) + (0, x.ndim - 1)
    chars = "".join(chr(ord("0") + i) for i in range(n))
    dn = lax.conv_dimension_numbers(
        (1,) * x.ndim, (1,) * x.ndim,
        ("N" + chars + "C", chars + "IO", "N" + chars + "C"),
    )
    dw = lax.conv_general_dilated(
        x.transpose(perm_x),
        g.transpose(perm_g),
        window_strides=(1,) * n,
        padding="VALID",
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    # output (Ci, *kd, Co) -> (*kd, Ci, Co)
    dw = dw.transpose(tuple(range(1, n + 1)) + (0, n + 1))
    return dx, dw.astype(w.dtype)


tap_conv_valid.defvjp(_tap_fwd, _tap_bwd)

"""Pallas TPU kernel for the fused decoder head's big composite op.

`ops/fused_head.py` collapses upsample4+Dropout3d+smooth into a single
stride-2 transposed convolution with a per-sample 5^3 composite kernel
(see its docstring for the math and the exactness corrections).  Its
XLA formulation must materialize a (B, 4, 112, 112, 125) tap tensor in
HBM (~400 MB at the reference config) in both forward and backward —
measured ~16 ms/step of pure memory traffic.

This kernel computes the same contraction with the tap tensor living
only in VMEM, one (CHUNK+2, W, C) input slab at a time:

  out[b, 2i - 2 + tau] += Kc[b, tau] . x[b, i]          (scatter form)

per grid cell (b, t_out): DMA the <=3 contributing input frames chunk
by chunk (double buffered), z = slab @ K on the MXU (all 125 taps as
output columns), then fold taps into the four (h-phase, w-phase) output
planes with roll-and-mask shifts.  Output is phase-separated
(B, T2, 2, 2, H, W) so no lane/sublane interleave happens in-kernel;
the caller does one cheap XLA transpose+reshape to (B, T2, 2H, 2W).

Backward stays in XLA but avoids the tap tensor too:
- dx = grouped stride-2 convolution of g with the per-sample kernels
  (feature_group_count=B, 128 output channels per group — MXU-friendly,
  unlike the forward direction whose 1 output channel per group idles
  the MXU);
- dK = one big GEMM over tap-shifted strided views of g.

Wired in via `fused_head._raw_fused` when running on TPU at d=3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 16  # input h rows per inner iteration
NTAPS = 128  # 125 real taps padded to a full lane dim

# per-axis scatter: out[2i - 2 + tau] += z[i, tau]; by output parity phi,
# tap tau contributes with input shift s (i = o' + s): (tau, s) pairs.
_PHASE_TAPS = {0: [(0, 1), (2, 0), (4, -1)], 1: [(1, 1), (3, 0)]}


def kernel_matrix(Kc: jax.Array) -> jax.Array:
    """(B, 5, 5, 5, C) composite kernels -> (B, NTAPS, C) tap matrices.

    Taps live on the SUBLANE side everywhere in the kernel: extracting a
    single tap plane is then a cheap second-minor index, whereas with
    taps on lanes every extraction is a cross-lane shuffle (the mistake
    that sank the round-1 pallas_smooth kernel at 125 taps it would cost
    ~3x the whole step).
    """
    B = Kc.shape[0]
    C = Kc.shape[-1]
    K = Kc.reshape(B, 125, C)  # (B, 125, C)
    return jnp.pad(K, ((0, 0), (0, NTAPS - 125), (0, 0)))


def _fwd_kernel(x_hbm, k_ref, y_ref, slab, zbuf, sems):
    b = pl.program_id(0)
    t_o = pl.program_id(1)
    B, T, H, W, C = x_hbm.shape
    n_chunks = H // CHUNK
    phi_t = t_o % 2  # traced; used only via masks

    def chunk_start(ci):  # clamped slab start row; static int
        return min(max(ci * CHUNK - 1, 0), H - (CHUNK + 2))

    def dma_chunk(slot, ci):
        # t-slots 0,1,2 <-> temporal input shift s_t = 1, 0, -1
        for dt in range(3):
            tc = jnp.clip(t_o // 2 + 1 - dt, 0, T - 1)
            pltpu.make_async_copy(
                x_hbm.at[b, tc, pl.ds(chunk_start(ci), CHUNK + 2)],
                slab.at[slot, dt],
                sems.at[slot, dt],
            ).start()

    def wait_chunk(slot):
        for dt in range(3):
            pltpu.make_async_copy(
                x_hbm.at[0, 0, pl.ds(0, CHUNK + 2)], slab.at[slot, dt],
                sems.at[slot, dt],
            ).wait()

    dma_chunk(0, 0)
    for ci in range(n_chunks):
        buf = ci % 2
        if ci + 1 < n_chunks:
            dma_chunk((ci + 1) % 2, ci + 1)
        wait_chunk(buf)

        data = slab[buf]  # (3, CHUNK+2, W, C)
        # zero t-halo slots whose input frame is outside [0, T)
        tids = (
            t_o // 2
            + 1
            - jax.lax.broadcasted_iota(jnp.int32, (3, 1, 1, 1), 0)
        )
        data = jnp.where((tids >= 0) & (tids < T), data, 0.0)

        # z[slot, r, tap, w] = K[tap, :] . data[slot, r, w, :] — taps on
        # the SUBLANE side so the fold below never crosses lanes.
        for slot in range(3):
            for r in range(CHUNK + 2):
                zbuf[slot, r] = jax.lax.dot_general(
                    k_ref[0],
                    data[slot, r],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (NTAPS, W)

        z = zbuf[:]  # (3, CHUNK+2, NTAPS, W)
        # realign so z rows cover input rows [ci*CHUNK - 1, ci*CHUNK+CHUNK+1)
        # with zeros outside [0, H)  (top/bottom chunks were DMA-clamped)
        h0 = ci * CHUNK - 1
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK + 2, 1, 1), 1)
        if h0 < chunk_start(ci):  # ci == 0: virtual row -1 at index 0
            z = pltpu.roll(z, shift=1, axis=1)
            z = jnp.where(rows == 0, 0.0, z)
        elif h0 > chunk_start(ci):  # last chunk: virtual row H at the end
            z = pltpu.roll(z, shift=CHUNK + 1, axis=1)
            z = jnp.where(rows == CHUNK + 1, 0.0, z)

        cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, W), 1)
        for phi_h in (0, 1):
            for phi_w in (0, 1):
                acc = jnp.zeros((CHUNK, W), jnp.float32)
                # temporal taps for BOTH parities; mask the wrong-parity
                # set to zero (phi_t is traced, so both loops emit and a
                # where() selects — the dead half folds to zeros).
                for par in (0, 1):
                    part = jnp.zeros((CHUNK, W), jnp.float32)
                    for tau_t, s_t in _PHASE_TAPS[par]:
                        slot = 1 - s_t
                        for tau_h, s_h in _PHASE_TAPS[phi_h]:
                            for tau_w, s_w in _PHASE_TAPS[phi_w]:
                                tap = tau_t * 25 + tau_h * 5 + tau_w
                                plane = z[
                                    slot,
                                    1 + s_h : 1 + s_h + CHUNK,
                                    tap,
                                    :,
                                ]  # (CHUNK, W), second-minor index
                                if s_w == 1:  # acc[w] += plane[w + 1]
                                    plane = jnp.where(
                                        cols == W - 1,
                                        0.0,
                                        pltpu.roll(plane, shift=W - 1, axis=1),
                                    )
                                elif s_w == -1:  # acc[w] += plane[w - 1]
                                    plane = jnp.where(
                                        cols == 0,
                                        0.0,
                                        pltpu.roll(plane, shift=1, axis=1),
                                    )
                                part = part + plane
                    acc = acc + jnp.where(phi_t == par, part, 0.0)
                y_ref[0, 0, phi_h, phi_w, pl.ds(ci * CHUNK, CHUNK), :] = acc


def _composite_fwd_impl(x, Kmat, *, interpret: bool = False):
    B, T, H, W, C = x.shape
    assert H % CHUNK == 0 and H >= CHUNK + 2, (H, CHUNK)
    out6 = pl.pallas_call(
        _fwd_kernel,
        grid=(B, 2 * T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x in HBM
            pl.BlockSpec(
                (1, NTAPS, C), lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 2, 2, H, W),
            lambda b, t: (b, t, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2 * T, 2, 2, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, CHUNK + 2, W, C), x.dtype),
            pltpu.VMEM((3, CHUNK + 2, NTAPS, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, Kmat.astype(x.dtype))
    # phase-separated (b, t, phi_h, phi_w, h', w') -> (b, t, 2H, 2W)
    B_, T2 = out6.shape[:2]
    out = out6.transpose(0, 1, 4, 2, 5, 3)  # (b, t, h', phi_h, w', phi_w)
    return out.reshape(B_, T2, 2 * H, 2 * W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def composite_convt(x: jax.Array, Kc: jax.Array, interpret: bool = False):
    """Per-sample ConvT(k5, s2, p2, op1), channel-contracted: the raw
    composite scatter out[b, 2i-2+tau] += Kc[b,tau,:] . x[b,i,:].

    x: (B, T, H, W, C); Kc: (B, 5, 5, 5, C) -> (B, 2T, 2H, 2W) f32.
    (No cropped-plane corrections here — fused_head._exact_fused applies
    them on top, exactly as for the XLA formulation.)
    """
    return _composite_fwd_impl(x, kernel_matrix(Kc), interpret=interpret)


def _composite_fwd(x, Kc, interpret):
    return composite_convt(x, Kc, interpret), (x, Kc)


def _composite_bwd(interpret, res, g):
    """Both gradients from ONE tap-gathered view of g.

    G[b, tau, i] = g[b, 2i - 2 + tau] (zeros out of range); then
      dx[b, i, c]   = sum_tau G[b, tau, i] * Kc[b, tau, c]
      dKc[b, tau, c] = sum_i   G[b, tau, i] * x[b, i, c]
    — two MXU GEMMs over the same (B, 125, T, H, W) tensor.  G is built
    from a phase-split of g (stack on axis=1, so no single-lane padding
    blow-up; a grouped giant-dilated-kernel conv for dKc measured
    ~26 ms, this whole backward is ~2 orders less traffic).
    """
    x, Kc = res
    B, T, H, W, C = x.shape
    g = g.astype(x.dtype)

    # G[b, i, tau] = g[b, 2i - 2 + tau] via ONE conv with a 5^3 identity
    # basis kernel (in-channel 1 -> 125 tap channels, stride 2, lo=2):
    # a single (B, T, H, W, 125) buffer with taps on lanes — any
    # slice-and-stack construction materializes 125 lane-padded pieces
    # (measured 24 GB of HLO temp).
    eye = jnp.eye(125, dtype=x.dtype).reshape(5, 5, 5, 1, 125)
    dn = jax.lax.conv_dimension_numbers(
        (B, 2 * T, 2 * H, 2 * W, 1), eye.shape, ("N012C", "012IO", "N012C")
    )
    G = jax.lax.conv_general_dilated(
        g[..., None],
        eye,
        window_strides=(2, 2, 2),
        padding=[(2, 1)] * 3,
        dimension_numbers=dn,
    )  # (B, T, H, W, 125)
    P = T * H * W
    Gt = G.reshape(B, P, 125)

    KcR = Kc.astype(x.dtype).reshape(B, 125, C)
    dx = jax.lax.dot_general(
        Gt, KcR,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (B, P, C)
    dx = dx.reshape(B, T, H, W, C).astype(x.dtype)
    dKc = jax.lax.dot_general(
        Gt,
        x.reshape(B, P, C),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (B, 125, C)
    dKc = dKc.reshape(B, 5, 5, 5, C)
    return dx, dKc.astype(Kc.dtype)


composite_convt.defvjp(_composite_fwd, _composite_bwd)

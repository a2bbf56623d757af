"""Pallas TPU kernel for the seg-head stencil (ConvT3d C->1, k3, s1, p1).

Why: the decoder's final `smooth` layer contracts 128 channels x 27 taps
into a SINGLE output channel per voxel.  XLA lowers that as a regular
convolution whose 1-wide output column wastes 127/128 MXU columns and
tiles the output lane dim at 1/128 — measured ~27 ms/step (fwd+bwd) at
batch 16, the single largest item in the train-step profile.

Kernel strategy (forward):
- grid over (batch, T); each program produces one (H, W) output plane;
- stream H in chunks with double-buffered DMA of x slabs
  (3 t-slices x (chunk+2) rows x W x C) from HBM;
- per chunk, one MXU matmul z = slab @ K with K (C, 32): all 27 taps
  (padded to 32 lanes) become output columns — 27/128 column utilization
  instead of 1/128, and z stays in VMEM;
- fold the taps with 27 shifted adds on the VPU (the halo rows/columns
  come from the slab's +-1 row margin and in-register W shifts);
- boundary voxels are handled by clamped DMA starts + zero masking,
  reproducing the zero padding of the reference conv.

The backward is two sibling kernels (dx, and a fused dx+dk accumulation)
wired through jax.custom_vjp; dz has taps as MXU *rows* so dx = dz @ K^T
runs with full 128 output columns.

Numerics: identical summation structure to conv_transpose_nd(x, k, 1, 1, 0)
up to f32 accumulation order; verified against it in tests (interpret
mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 16  # H rows per inner iteration
NTAPS = 32  # 27 real taps padded to a sublane-friendly 32


def _kernel_matrix(kernel: jax.Array) -> jax.Array:
    """(3,3,3,C,1) torch-layout transpose-conv kernel -> (C, 32) tap matrix.

    conv_transpose flips the kernel spatially; tap index = dt*9 + dh*3 + dw
    indexes the *flipped* kernel.
    """
    kf = jnp.flip(kernel[..., 0], axis=(0, 1, 2))  # (3,3,3,C)
    C = kf.shape[-1]
    K = kf.reshape(27, C).T  # (C, 27)
    return jnp.pad(K, ((0, 0), (0, NTAPS - 27)))


def _fwd_kernel(x_hbm, k_ref, y_ref, slab, sems):
    b = pl.program_id(0)
    t = pl.program_id(1)
    T = pl.num_programs(1)
    H = y_ref.shape[2]
    W = y_ref.shape[3]
    C = x_hbm.shape[-1]
    n_chunks = H // CHUNK

    # The chunk loop is unrolled (n_chunks is small and static) so every
    # DMA address and boundary case is compile-time constant.
    def chunk_start(ci):  # clamped slab start row; static int
        return min(max(ci * CHUNK - 1, 0), H - (CHUNK + 2))

    def dma_chunk(slot, ci):
        for dt in range(3):
            tc = jnp.clip(t + dt - 1, 0, T - 1)
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
        slot = ci % 2
        if ci + 1 < n_chunks:
            dma_chunk((ci + 1) % 2, ci + 1)
        wait_chunk(slot)

        data = slab[slot]  # (3, CHUNK+2, W, C), rows = global h_start..
        # zero t-halo slices outside [0, T)
        tids = jax.lax.broadcasted_iota(jnp.int32, (3, 1, 1, 1), 0) + t - 1
        data = jnp.where((tids >= 0) & (tids < T), data, 0.0)

        # z = data . K on the MXU: all 27 taps as output columns
        z = jax.lax.dot_general(
            data.reshape(3 * (CHUNK + 2) * W, C),
            k_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(3, CHUNK + 2, W, NTAPS)

        # realign so z_eff rows cover global [ci*CHUNK - 1, ci*CHUNK + CHUNK + 1)
        # with zero rows where that range leaves [0, H).  Mosaic dislikes
        # sub-tile concatenates, so realignment uses roll + iota masks.
        h0 = ci * CHUNK - 1
        h_start = chunk_start(ci)
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK + 2, 1, 1), 1)
        if h0 < h_start:  # top chunk: virtual row -1 enters at index 0
            z_eff = pltpu.roll(z, shift=1, axis=1)
            z_eff = jnp.where(rows == 0, 0.0, z_eff)
        elif h0 > h_start:  # bottom chunk: virtual row H enters at the end
            z_eff = pltpu.roll(z, shift=CHUNK + 1, axis=1)  # == -1
            z_eff = jnp.where(rows == CHUNK + 1, 0.0, z_eff)
        else:
            z_eff = z

        # fold taps: y[hh, w] = sum_d z_eff[dt, hh + dh, w + dw - 1, tap(d)]
        cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, W), 1)
        acc = jnp.zeros((CHUNK, W), jnp.float32)
        for dt in range(3):
            for dh in range(3):
                zrows = z_eff[dt, dh : dh + CHUNK]  # (CHUNK, W, NTAPS)
                for dw in range(3):
                    tap = (dt * 3 + dh) * 3 + dw
                    plane = zrows[:, :, tap]
                    if dw == 0:  # shifted[w] = plane[w-1], zero at w=0
                        shifted = jnp.where(
                            cols == 0, 0.0, pltpu.roll(plane, shift=1, axis=1)
                        )
                    elif dw == 2:  # shifted[w] = plane[w+1], zero at w=W-1
                        shifted = jnp.where(
                            cols == W - 1,
                            0.0,
                            pltpu.roll(plane, shift=W - 1, axis=1),  # == -1
                        )
                    else:
                        shifted = plane
                    acc = acc + shifted
        y_ref[0, 0, pl.ds(ci * CHUNK, CHUNK), :] = acc


def _smooth_fwd_impl(x: jax.Array, K: jax.Array, *, interpret: bool = False):
    B, T, H, W, C = x.shape
    assert H % CHUNK == 0 and H >= CHUNK + 2, (H, CHUNK)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # K
        ],
        out_specs=pl.BlockSpec(
            (1, 1, H, W), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, CHUNK + 2, W, C), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, K.astype(x.dtype))


def _dw_shift(plane, dw, W):
    if dw == 0:
        return jnp.concatenate(
            [jnp.zeros((*plane.shape[:-1], 1), plane.dtype), plane[..., : W - 1]],
            axis=-1,
        )
    if dw == 2:
        return jnp.concatenate(
            [plane[..., 1:], jnp.zeros((*plane.shape[:-1], 1), plane.dtype)],
            axis=-1,
        )
    return plane


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def smooth_head(x: jax.Array, kernel: jax.Array, interpret: bool = False):
    """ConvT3d(C->1, k3, s1, p1) without bias: (B,T,H,W,C) -> (B,T,H,W) f32."""
    K = _kernel_matrix(kernel)
    return _smooth_fwd_impl(x, K, interpret=interpret)


def _smooth_fwd(x, kernel, interpret):
    return smooth_head(x, kernel, interpret), (x, kernel)


def _smooth_bwd(interpret, res, dy):
    """Backward in plain XLA: dz has taps as contraction *rows*, so both
    dx = dz @ K^T and dk = x^T @ dz are lane-friendly GEMMs (the forward's
    pathology — a 1-wide output — does not appear here)."""
    x, kernel = res
    B, T, H, W, C = x.shape
    K = _kernel_matrix(kernel)  # (C, 32)
    dy = dy.astype(jnp.float32)

    # dz[b,t,h,w,tap] = dy shifted by -offset(tap); offsets are (dt-1, dh-1, dw-1)
    planes = []
    dyp = jnp.pad(dy, ((0, 0), (1, 1), (1, 1), (1, 1)))
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                planes.append(
                    jax.lax.dynamic_slice(
                        dyp,
                        (0, 2 - dt, 2 - dh, 2 - dw),
                        (B, T, H, W),
                    )
                )
    dz = jnp.stack(planes + [jnp.zeros_like(dy)] * (NTAPS - 27), axis=-1)

    dx = jax.lax.dot_general(
        dz.astype(x.dtype),
        K.T.astype(x.dtype),
        dimension_numbers=(((4,), (0,)), ((), ())),
    )  # (B,T,H,W,C)

    dK = jnp.einsum(
        "bthwc,bthwd->cd",
        x.astype(jnp.float32),
        dz,
        preferred_element_type=jnp.float32,
    )  # (C, 32)
    # back out the kernel-layout gradient: K[c, tap] = flip(kernel)[tap, c]
    dkf = dK[:, :27].T.reshape(3, 3, 3, C)
    dkernel = jnp.flip(dkf, axis=(0, 1, 2))[..., None].astype(kernel.dtype)
    return dx, dkernel


smooth_head.defvjp(_smooth_fwd, _smooth_bwd)

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

The backward is a second Pallas kernel (_bwd_kernel): g is phase-split
once in XLA (one transpose; parity rho per axis), then per grid cell
the 125-tap gathered view G[b, i, tau] = g[b, 2i - 2 + tau] is
assembled chunk-by-chunk in VMEM (slab DMA + roll-and-mask shifts of
the 8 phase planes) and consumed in place by two per-row MXU GEMMs —
dx = G-contract-taps @ Kc and dKc += G @ x — so neither the
(B, T, H, W, 125) G tensor nor any lane-padded tap stack ever touches
HBM.  (The XLA fallback builds G with one identity-basis conv, whose
Cin=1 contraction runs far below MXU peak — measured ~3 ms/step — and
a slice-and-stack construction is worse still: 125 lane-padded pieces,
~24 GB of HLO temps.)

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
                    # 16-bit operands must contract at DEFAULT precision:
                    # an ambient `highest` (tests/conftest.py) asks Mosaic
                    # for a multi-pass bf16 emulation it rejects ("Bad
                    # lhs type"); accumulation is f32 regardless via
                    # preferred_element_type.
                    precision=(
                        jax.lax.Precision.DEFAULT
                        if jnp.dtype(data.dtype).itemsize == 2
                        else None
                    ),
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


def _bwd_kernel(gp_hbm, x_hbm, k_ref, dx_ref, dk_ref, gslab, xslab,
                sems, xsem):
    """Both composite gradients from phase-split g, G tiles in VMEM.

    gp_hbm: (B, 8, T+2, H, 1, 128) phase-split output grad with a
    1-frame temporal halo on axis 2 (so every jt = t + mt - 1 is a
    plain in-range index) and W zero-padded to one full 128-lane tile.
    The trailing dummy axis makes (1, 128) the TILED dims, so the H
    slab slices (arbitrary offsets, CHUNK+2 rows) are legal on bf16
    whose natural (H, W) tiling is (8, 128) with sublane packing.
    Phase rho = 4*rho_t + 2*rho_h + rho_w; with tau = 2m + rho per
    axis, G[b, i, tau] = gp[b, rho, i + m - 1], assembled per chunk as
    a stacked VALUE (roll-and-mask shifts of the slab, no strided
    scratch stores), then both gradients are per-row MXU GEMMs against
    the tap dim:
        dx[r] = G[:, r, :].T-contract-taps @ K   ((W,128)x(128,C))
        dKc  += G[:, r, :] @ x[r]                ((128,W)x(W,C)),
    accumulated over rows, chunks and the t grid dim (the same b output
    block is revisited, so += carries across t).
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    B, _, Tp2, H, _, Wp = gp_hbm.shape  # Wp == 128
    W = x_hbm.shape[-2]
    C = x_hbm.shape[-1]
    T = Tp2 - 2
    n_chunks = H // CHUNK
    SLAB = CHUNK + 2

    def chunk_start(ci):  # clamped slab start row; static int
        return min(max(ci * CHUNK - 1, 0), H - SLAB)

    def dma_chunk(slot, ci):
        # gp rows [chunk_start, chunk_start + SLAB) for all 8 phases and
        # the 3 temporal slots jt = t + mt - 1 + 1(halo) = t + mt
        for mt in range(3):
            pltpu.make_async_copy(
                gp_hbm.at[b, :, t + mt, pl.ds(chunk_start(ci), SLAB)],
                gslab.at[slot, :, mt],
                sems.at[slot, mt],
            ).start()
        pltpu.make_async_copy(
            x_hbm.at[b, t, pl.ds(ci * CHUNK, CHUNK)],
            xslab.at[slot],
            xsem.at[slot],
        ).start()

    def wait_chunk(slot):
        for mt in range(3):
            pltpu.make_async_copy(
                gp_hbm.at[0, :, 0, pl.ds(0, SLAB)], gslab.at[slot, :, 0],
                sems.at[slot, mt],
            ).wait()
        pltpu.make_async_copy(
            x_hbm.at[0, 0, pl.ds(0, CHUNK)], xslab.at[slot], xsem.at[slot]
        ).wait()

    dma_chunk(0, 0)
    for ci in range(n_chunks):
        buf = ci % 2
        if ci + 1 < n_chunks:
            dma_chunk((ci + 1) % 2, ci + 1)
        wait_chunk(buf)

        # slab arrives in f32 (see _composite_bwd_impl): Mosaic's rotate
        # (pltpu.roll) only handles 32-bit element types, and bf16's
        # sublane packing would make the dummy-dim DMA slice illegal
        gsl = gslab[buf, :, :, :, 0, :]  # (8, 3, SLAB, 128) value
        h0 = ci * CHUNK
        # slab rows cover [chunk_start, chunk_start + SLAB); row
        # j = h0 + r + mh - 1 sits at slab index base + mh + r with
        # base = h0 - 1 - chunk_start (in [-1, 1] across clamping).
        base = h0 - 1 - chunk_start(ci)
        cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, Wp), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, Wp), 0)
        planes = []
        for tau_t in range(5):
            mt, rho_t = tau_t >> 1, tau_t & 1
            jt = t + mt - 1  # temporal validity: jt in [0, T)
            t_ok = (jt >= 0) & (jt < T)
            for tau_h in range(5):
                mh, rho_h = tau_h >> 1, tau_h & 1
                for tau_w in range(5):
                    mw, rho_w = tau_w >> 1, tau_w & 1
                    rho = 4 * rho_t + 2 * rho_h + rho_w
                    # plane[r] = slab row base + mh + r; starts escaping
                    # [0, SLAB - CHUNK] get an in-range slice + roll,
                    # the escaping row is masked invalid below
                    s0 = base + mh
                    if s0 < 0:  # -1 (top chunk)
                        plane = gsl[rho, mt, 0:CHUNK, :]
                        plane = pltpu.roll(plane, shift=1, axis=0)
                    elif s0 > SLAB - CHUNK:  # 3 (clamped last chunk)
                        plane = gsl[rho, mt, SLAB - CHUNK : SLAB, :]
                        plane = pltpu.roll(plane, shift=CHUNK - 1, axis=0)
                    else:
                        plane = gsl[rho, mt, s0 : s0 + CHUNK, :]
                    # h validity: j_h = h0 + r + mh - 1 in [0, H)
                    jh = rows + h0 + mh - 1
                    # w validity (incl. the lane pad Wp > W): j_w =
                    # w + mw - 1 in [0, W)
                    jw = cols + mw - 1
                    ok = t_ok & (jh >= 0) & (jh < H) & (jw >= 0) & (jw < W)
                    if mw == 0:
                        plane = pltpu.roll(plane, shift=1, axis=1)
                    elif mw == 2:
                        plane = pltpu.roll(plane, shift=Wp - 1, axis=1)
                    planes.append(
                        jnp.where(ok, plane, 0.0)
                    )
        # pad taps 125..127 with zeros to match K's padded rows
        planes += [jnp.zeros((CHUNK, Wp), jnp.float32)] * (NTAPS - 125)
        G = jnp.stack(planes)[:, :, :W]  # (NTAPS, CHUNK, W)

        K = k_ref[0]  # (NTAPS, C)
        xsl = xslab[buf]  # (CHUNK, W, C)
        for r in range(CHUNK):
            Gr = G[:, r, :]  # (NTAPS, W)
            dx_ref[0, 0, h0 + r] = jax.lax.dot_general(
                Gr, K,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # see the forward kernel: 16-bit K under an ambient
                # `highest` is rejected by Mosaic
                precision=(
                    jax.lax.Precision.DEFAULT
                    if jnp.dtype(K.dtype).itemsize == 2
                    else None
                ),
            ).astype(dx_ref.dtype)  # (W, C)
            dk_part = jax.lax.dot_general(
                Gr, xsl[r].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (NTAPS, C)
            if ci == 0 and r == 0:

                @pl.when(t == 0)
                def _init():
                    dk_ref[0] = dk_part

                @pl.when(t != 0)
                def _acc():
                    dk_ref[0] += dk_part
            else:
                dk_ref[0] += dk_part


def _composite_bwd_impl(g, x, Kmat, *, interpret: bool = False):
    """Pallas backward: dx and dKc-matrix from the output cotangent g."""
    B, T, H, W, C = x.shape
    # phase-split with a zeroed 1-frame temporal halo on both ends:
    # gp[b, rho, 1 + jt, jh, jw] = g[b, 2jt+rho_t, 2jh+rho_h, 2jw+rho_w]
    gp = (
        g.reshape(B, T, 2, H, 2, W, 2)
        .transpose(0, 2, 4, 6, 1, 3, 5)
        .reshape(B, 8, T, H, W)
    )
    # 1-frame zeroed temporal halo + W padded to ONE full 128-lane tile,
    # then a dummy axis so (1, 128) are the tiled dims: H slab slices at
    # arbitrary offsets are illegal on bf16's natural (8, 128)+packing
    # tiling but unrestricted once H is an untiled dim.
    assert W <= 128, "bwd kernel handles a single lane tile (W <= 128)"
    Wp = 128
    gp = jnp.pad(gp, ((0, 0), (0, 0), (1, 1), (0, 0), (0, Wp - W)))
    # gp crosses into the kernel in f32 REGARDLESS of compute dtype: the
    # planes are consumed in f32 anyway, and under bf16 the (1, 128)
    # trailing dims sublane-pack to a (2, 128) tile, making the
    # extent-1 dummy-dim DMA slice illegal ("Slice shape along dimension
    # 4 must be aligned to tiling (2), but is 1").  f32 has no packing,
    # so the dummy axis stays a true size-1 tile dim.
    gp = gp.reshape(B, 8, T + 2, H, 1, Wp).astype(jnp.float32)
    dx, dk = pl.pallas_call(
        _bwd_kernel,
        grid=(B, T),
        in_specs=[
            # gp/x FORCED to HBM: pl.ANY can VMEM-place small inputs,
            # whose memref slicing then demands tile-aligned extents the
            # W lane dim does not have (DMA from HBM has no such rule)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, NTAPS, C), lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, H, W, C), lambda b, t: (b, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, NTAPS, C), lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((B, NTAPS, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, 3, CHUNK + 2, 1, Wp), jnp.float32),
            pltpu.VMEM((2, CHUNK, W, C), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(gp, x, Kmat.astype(x.dtype))
    return dx, dk


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
    """Backward dispatch: Pallas G-tile kernel on TPU, XLA otherwise.

    Both gradients come from the tap-gathered view
      G[b, i, tau] = g[b, 2i - 2 + tau] (zeros out of range);
      dx[b, i, c]   = sum_tau G[b, i, tau] * Kc[b, tau, c]
      dKc[b, tau, c] = sum_i   G[b, i, tau] * x[b, i, c].
    The Pallas path (_composite_bwd_impl) never materializes G in HBM:
    tiles are assembled in VMEM from a phase-split of g (rolls + masks)
    and consumed by per-row MXU GEMMs.  The XLA path builds G with one
    identity-basis conv (a (B,T,H,W,125) buffer; slice-and-stack
    alternatives materialize 125 lane-padded pieces ~ 24 GB of HLO temp,
    and a grouped giant-dilated-kernel conv for dKc measured ~26 ms).
    """
    x, Kc = res
    B, T, H, W, C = x.shape
    g = g.astype(x.dtype)

    if (
        jax.default_backend() == "tpu"
        and H % CHUNK == 0
        and H >= CHUNK + 2
        and W <= 128  # gp is padded to a single lane tile
        and not interpret
    ):
        dx, dk = _composite_bwd_impl(g, x, kernel_matrix(Kc))
        dKc = dk[:, :125, :].reshape(B, 5, 5, 5, C)
        return dx, dKc.astype(Kc.dtype)

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

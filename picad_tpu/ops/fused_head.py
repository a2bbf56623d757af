"""Fused decoder head: upsample4 -> Dropout3d -> smooth in ONE pass.

The reference decoder ends with a purely linear chain
(models/capsules_ucf101.py:504-509):

    y   = ConvTranspose3d(128 -> 128, k3, s2, p1, op1)(x) + b4   # (B,8,224,224,128)
    y   = Dropout3d(0.5)(y)            # per-(sample, channel) scale
    seg = ConvTranspose3d(128 -> 1, k3, s1, p1)(y) + bs          # (B,8,224,224,1)

Run naively this materializes a (B, 8, 224, 224, 128) tensor (the
largest in the model — ~800 MB at bs16 bf16) and spends ~45 GFLOP/clip
on up4 alone.  The chain is affine, so it collapses into a single
stride-2 transposed convolution with the 5^3 composite kernel

    Kc_b[tau, c] = sum_m (K1 * K2)[tau, c, m] * d[b, m]

(d = channelwise dropout scale in {0, 1/keep}; kernel-index-sum
composition).  One subtlety makes the naive composite inexact: up4
SCATTERS mass onto an intermediate index t = 2i - 1 + alpha = -1 (from
i = 0, alpha = 0 on each axis) which it then crops, while the composite
would leak that plane through k2's last tap into output position 0.
The leak lives on the o=0 face of each axis only, and each leak term is
itself the same fused op in one fewer dimension (kernels sliced at
alpha=0 / beta=2, input sliced at i=0) — so an inclusion-exclusion over
axis subsets (3 face planes - 3 edge lines + 1 corner at the reference
rank) subtracts it EXACTLY.  Verified against the literal ConvT chain to
f32 tolerance, values and gradients (tests/test_fused_head.py).

The big contraction is computed lane-friendly (a direct 1-output-channel
conv idles 127/128 MXU lanes): one batched GEMM folds channels into all
125 composite taps at input resolution, then the stride-2 transposed
scatter becomes shifted slice-accumulations into 2^3 output phase
planes, interleaved at the end.  b4's contribution through dropout +
smooth is an analytic border-aware bias map (per-axis tap-validity
indicators), not another full-resolution conv.

Net effect at the reference config: ~30x fewer FLOPs than up4+smooth and
no full-resolution 128-channel intermediate, in forward AND backward.
"""

from __future__ import annotations

import contextlib
import itertools
import string

import jax
import jax.numpy as jnp

# per-axis scatter: out[2i - 2 + tau] += z[i, tau]; split by output parity
# phi = tau mod 2 -> (tap, input shift) pairs per phase
_PHASE_TAPS = {0: [(0, 1), (2, 0), (4, -1)], 1: [(1, 1), (3, 0)]}

# Trace-time kill switch for the Pallas path.  The dispatch below keys on
# jax.default_backend(), which reflects the HOST the trace runs on — a
# serving export (picad_tpu.serve) traced on a TPU host would otherwise
# bake a Mosaic custom-call into an artifact that must stay portable
# across compiler versions and platforms.
_PALLAS_OK = True


@contextlib.contextmanager
def pallas_disabled():
    """Force the pure-XLA chain for traces inside this context (the two
    are oracle-tested equal; the kernel is a perf fast path only)."""
    global _PALLAS_OK
    prev, _PALLAS_OK = _PALLAS_OK, False
    try:
        yield
    finally:
        _PALLAS_OK = prev


def pallas_head_active(sp, channels, dtype) -> bool:
    """True when `_raw_fused` would dispatch the Pallas composite-ConvT
    kernel for a (B, *sp, channels) input of `dtype` — the single source
    of truth for the dispatch gate, shared with bench.py's analytic FLOP
    crediting (XLA's cost model counts Pallas custom-calls as 0 FLOPs, so
    the bench may only add the kernel's work when it actually ran)."""
    return (
        len(sp) == 3
        and _PALLAS_OK
        and jax.default_backend() == "tpu"
        and jnp.dtype(dtype).itemsize == 2  # PRODUCTION dtype only: the
        # f32 model path stays on the XLA chain, which is the golden-
        # parity baseline — the kernel's tap-major accumulation order
        # shifts f32 losses by ~3e-4 rel through the EM cost_std
        # amplification (observed at the 96^2 train-parity shape), while
        # bf16 tolerances absorb it.  The f32 kernel itself stays covered
        # by the direct tests (tests/test_pallas_fused_head.py).
        and sp[1] % 16 == 0  # H chunking (CHUNK=16)
        and sp[1] >= 18  # >= CHUNK + 2 halo rows
        and sp[2] >= 8  # any lane-dim width; a round-2 Mosaic build
        # rejected the tap GEMM at W=48, which no longer reproduces —
        # the width sweep (48/64/80/96/112/128) compiles and matches the
        # XLA ConvT reference (tests/test_pallas_fused_head.py)
        and channels % 128 == 0  # full lane tiles for the VMEM slab
    )


def compose_transpose_kernels(k1: jax.Array, k2: jax.Array) -> jax.Array:
    """Kernel-index-sum composition of two ConvT kernels over d axes.

    k1: (*3^d, Cin, M), k2: (*3^d, M, 1) ->
    P: (*5^d, Cin, M) with P[a + b, c, m] = sum k1[a, c, m] * k2[b, m, 0].
    (conv_transpose_nd flips both kernels identically, so index addition
    composes; d = 0 degenerates to P[c, m] = k1[c, m] * k2[m, 0].)
    """
    d = k1.ndim - 2
    if d == 0:
        return k1 * k2[..., 0][None, :]
    k2v = k2[..., 0]  # (*3^d, M)
    n = 5
    P = jnp.zeros((n,) * d + k1.shape[-2:], k1.dtype)
    for a in itertools.product(range(3), repeat=d):
        idx = tuple(slice(a[i], a[i] + 3) for i in range(d))
        contrib = (
            k1[a][(None,) * d]  # (1..1, Cin, M)
            * k2v[..., None, :]  # (*3^d, 1, M)
        )
        P = P.at[idx].add(contrib)
    return P


def _raw_fused(x, k1, k2, drop_scale):
    """Composite scatter WITHOUT the cropped-plane correction.

    x: (B, *sp^d, C); k1: (*3^d, C, M); k2: (*3^d, M, 1); drop (B, M).
    Returns (B, *(2 * sp)^d) in f32.  d may be 0..3.
    """
    d = x.ndim - 2
    B = x.shape[0]
    sp = x.shape[1:-1]
    f32 = jnp.float32

    P = compose_transpose_kernels(k1.astype(f32), k2.astype(f32))
    Kc = jnp.einsum(
        P, list(range(d)) + [d, d + 1],
        drop_scale.astype(f32), [d + 2, d + 1],
        [d + 2] + list(range(d)) + [d],
        preferred_element_type=f32,
    )  # (B, *5^d, C)

    if d == 0:
        return jnp.einsum("bc,bc->b", x.astype(f32), Kc)

    dt = x.dtype
    if pallas_head_active(sp, x.shape[-1], dt):
        # TPU: the Pallas kernel keeps the (B, *sp, 125) tap tensor in
        # VMEM instead of HBM (ops/pallas_fused_head.py).
        from picad_tpu.ops.pallas_fused_head import composite_convt

        return composite_convt(x, Kc)
    # Pad x BEFORE the tap GEMM: x is ~tap-count smaller than the tap
    # tensor, and GEMM-of-zero-rows = 0, so the einsum output IS the
    # padded tap tensor — no separate full-size pad materialization
    # (measured ~20 ms/step of pure HBM traffic at the reference config).
    xp = jnp.pad(x, [(0, 0)] + [(1, 1)] * d + [(0, 0)])
    # zp[b, *ipad^d, *tau^d] = sum_c xp[b, i, c] * Kc[b, tau, c].
    # The 128-channel contraction accumulates in f32 even under bf16
    # compute (preferred_element_type below): storing taps at bf16 would
    # round each of the 125 composite values before the f32 phase
    # accumulation, deviating from the unfused ConvT chain it must match.
    xi = [0] + list(range(1, d + 1)) + [2 * d + 1]
    ki = [0] + list(range(d + 1, 2 * d + 1)) + [2 * d + 1]
    zi = [0] + list(range(1, 2 * d + 1))
    zp = jnp.einsum(
        xp, xi, Kc.astype(dt), ki, zi, preferred_element_type=f32
    )  # (B, *(sp+2), *5^d), f32

    phases = []
    for phi in itertools.product((0, 1), repeat=d):
        acc = jnp.zeros((B, *sp), f32)
        for taps in itertools.product(
            *[_PHASE_TAPS[phi[a]] for a in range(d)]
        ):
            idx = (
                (slice(None),)
                + tuple(
                    slice(1 + s, 1 + s + sp[a]) for a, (_, s) in enumerate(taps)
                )
                + tuple(t for (t, _) in taps)
            )
            acc = acc + zp[idx].astype(f32)
        phases.append(acc)
    out = jnp.stack(phases, axis=1)  # (B, 2^d, *sp)
    out = out.reshape(B, *((2,) * d), *sp)
    # interleave: (B, 2, 2, ..., s1, s2, ...) -> (B, s1, 2, s2, 2, ...)
    perm = [0]
    for a in range(d):
        perm += [1 + d + a, 1 + a]
    out = jnp.transpose(out, perm)
    return out.reshape(B, *(2 * s for s in sp))


def _exact_fused(x, k1, k2, drop_scale):
    """Inclusion-exclusion over axis subsets: subtract the cropped-plane
    leak on every o=0 face (see module docstring)."""
    d = x.ndim - 2
    out = _raw_fused(x, k1, k2, drop_scale)
    for r in range(1, d + 1):
        for S in itertools.combinations(range(d), r):
            x_idx = tuple(
                0 if a in S else slice(None) for a in range(d)
            )
            k1_idx = tuple(0 if a in S else slice(None) for a in range(d))
            k2_idx = tuple(2 if a in S else slice(None) for a in range(d))
            corr = _raw_fused(
                x[(slice(None),) + x_idx],
                k1[k1_idx],
                k2[k2_idx],
                drop_scale,
            )
            sign = -1.0 if r % 2 == 1 else 1.0
            out_idx = tuple(
                0 if a in S else slice(None) for a in range(d)
            )
            out = out.at[(slice(None),) + out_idx].add(sign * corr)
    return out


def smooth_bias_map(
    k2: jax.Array, out_shape: tuple[int, ...]
) -> jax.Array:
    """S[pos, m] = sum of k2 taps that land in-domain at pos.

    Equals conv_transpose_nd(one-hot channel maps, k2, 1, 1, 0)
    analytically: ConvT(k3, s1, p1) tap beta of the unflipped kernel
    multiplies y[o + 1 - beta], so the valid-tap set factorizes per axis
    into tiny indicator einsums.  Interior = full tap sum; the 1-px
    border shells get the exact partial sums.

    Per-step cost: this depends on k2 (a TRAINED param), so it cannot
    be hoisted out of the jitted step as a constant — but the d
    indicator einsums total ~3 * out_size * 27 * M mul-adds (~0.4
    MFLOP at the 224^2 production shape vs ~3 TFLOP/step), and XLA
    CSEs the single call site; the device trace shows no measurable
    bias-map op (tools/trace_step.py).
    """
    d = k2.ndim - 2
    k2v = k2[..., 0]  # (*3^d, M)
    s = k2v
    letters = string.ascii_lowercase
    for axis in range(d):
        size = out_shape[axis]
        o = jnp.arange(size)[:, None]
        beta = jnp.arange(k2.shape[axis])[None, :]
        y_idx = o + 1 - beta
        I = ((y_idx >= 0) & (y_idx < size)).astype(k2.dtype)
        # contract axis `axis` of s (currently at position `axis`)
        s_dims = letters[: s.ndim]
        out_dims = s_dims.replace(s_dims[axis], "z")
        s = jnp.einsum(f"z{s_dims[axis]},{s_dims}->{out_dims}", I, s)
    return s  # (*out_shape, M)


def fused_decoder_head(
    x: jax.Array,  # (B, T, H, W, C) decoder tensor before upsample4
    k1: jax.Array,  # (3, 3, 3, C, M) upsample4 ConvT kernel
    b4: jax.Array,  # (M,) upsample4 bias
    k2: jax.Array,  # (3, 3, 3, M, 1) smooth ConvT kernel
    bs: jax.Array,  # (1,) smooth bias
    drop_scale: jax.Array,  # (B, M) channel dropout scale {0, 1/keep} (ones at eval)
) -> jax.Array:
    """Exact smooth(dropout(upsample4(x))) without the full-res intermediate.

    Returns (B, 2T, 2H, 2W) segmentation logits (channel squeezed),
    in x.dtype.
    """
    B, T, H, W, C = x.shape
    out = _exact_fused(x, k1, k2, drop_scale)

    # b4 through dropout + smooth: exact border-aware bias map (f32)
    S = smooth_bias_map(
        k2.astype(jnp.float32), (2 * T, 2 * H, 2 * W)
    )  # (T2, H2, W2, M)
    db = drop_scale.astype(jnp.float32) * b4.astype(jnp.float32)[None, :]
    bias = jnp.einsum(
        "thwm,bm->bthw", S, db, preferred_element_type=jnp.float32
    )
    return (out + bias + bs.astype(jnp.float32).reshape(())).astype(x.dtype)

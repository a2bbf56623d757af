"""Pallas dual-reduction kernel for BatchNorm batch statistics.

Measured LOSS — stays OFF (hardware A/B, v5e full train step,
tools/ab_tapconv.py --bn-pallas, 2026-08-20, two runs: 72.86 / 72.73 ms
vs the 72.17 / 71.82 ms one-pass comparator whose XLA reduce it
replaces — reproducibly ~0.7-0.9 ms SLOWER, and also behind the
72.59 / 72.41 ms two-pass baseline).  The XLA one-pass fused reduction
already runs these (..., 64)-channel stat passes within ~1 ms of this
hand-scheduled loop, and pallas_call costs what the fusion saves: the
kernel is an HBM->VMEM stream either way, but XLA's version fuses the
f32 convert + shift subtraction into the PRODUCING fusion while the
Pallas call forces x to be materialized as its operand.  Kept in-tree
as an exact, oracle-tested identity (tests/test_bn_stats.py);
`PICAD_BN_PALLAS=1` re-enables for future re-measurement.

Original hypothesis: `PICAD_BN_PALLAS=1` routes the big
stem/skip BN statistics through ONE Pallas pass that streams x through
VMEM once and emits per-group mean and (biased) variance directly.

Why attempt this: the round-4 device trace attributes ~6.9 ms of the
~71 ms step to the 112^2 BN-stat fusions (README trace table, fusions
#2/#3), running at ~100-200 GB/s effective against v5e's ~800 GB/s HBM
— XLA's reduce fusions on these (..., 64)-channel tensors leave real
bandwidth on the table.  The one-pass shifted-stats rewrite
(models/layers.py) already removed one whole HBM read; this kernel
attacks the remaining seam: a hand-scheduled tile loop with f32
accumulators that the compiler cannot split or spill.

Numerics (same contract as the shifted one-pass form in layers.py):
the kernel subtracts a per-group shift c = mean(first tile) before
accumulating sum and sum-of-squares, so var = E[(x-c)^2] - E[x-c]^2 is
cancellation-safe (amplification 1 + (mean-c)^2/var with c a
data-subsample mean), unlike the textbook E[x^2]-E[x]^2 which FAILED
the train-mode golden on hardware (README, one-pass lever history).
The shift is algebraically a no-op for both outputs, and the custom
VJP is the exact analytic gradient of (mean, var) — identical to the
two-pass XLA form's:

    d mean / dx_i = g_mean / n
    d var  / dx_i = 2 (x_i - mean) g_var / n

(the mean's inner dependence in var contributes 0 since
sum(x - mean) = 0), so the backward is pure fusable XLA elementwise.

Replaces the reference's torch BatchNorm3d batch-stat computation
(models/pytorch_i3d.py:80) on the TPU fast path; values/grads are
oracle-tested against the two-pass form (tests/test_bn_stats.py).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

# Default OFF: the full-step A/B measured it a reproducible loss
# (module comment); "1" re-enables for re-measurement.
_ENABLED = os.environ.get("PICAD_BN_PALLAS", "0") == "1"

# Hard VMEM comfort bound for one (TM, C) f32 tile.
_TILE_BYTES_MAX = 2 << 20


def _pick_tile(n: int, c: int) -> int | None:
    """Largest power-of-2 row-tile TM that divides n, keeps 8-sublane
    alignment, and fits the VMEM comfort bound; None if none exists."""
    tm = 4096
    while tm >= 8:
        if n % tm == 0 and tm * c * 4 <= _TILE_BYTES_MAX:
            return tm
        tm //= 2
    return None


def pallas_stats_active(shape, groups: int, dtype) -> bool:
    """True when `group_stats` would dispatch the Pallas kernel — the
    single source of truth for the gate (layers.TorchBatchNorm and any
    analytic FLOP/bytes crediting must share it)."""
    if not _ENABLED or jax.default_backend() != "tpu":
        return False
    b, c = shape[0], shape[-1]
    if b % groups:
        return False
    n = 1
    for d in shape[:-1]:
        n *= d
    n //= groups
    return c % 8 == 0 and _pick_tile(n, c) is not None


def _stats_pallas(x3: jax.Array, *, tm: int, interpret: bool = False):
    """x3: (G, n, C) -> (mean, var) each (G, C) f32.

    Grid (G, n/tm); TPU grid iterations run sequentially per core, so a
    VMEM scratch accumulator carries partial sums across the j axis and
    resets at each group's first tile.  Partial sums are kept as (8, C)
    sublane-folded lanes so the running add is one VPU op per tile; the
    final fold to (C,) happens once per group.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, n, C = x3.shape
    nt = n // tm

    def kernel(x_ref, mean_ref, var_ref, acc_ref, shift_ref):
        g = pl.program_id(0)
        j = pl.program_id(1)
        tile = x_ref[0].astype(jnp.float32)  # (tm, C)

        @pl.when(j == 0)
        def _():
            # per-group shift = mean of the group's FIRST tile (a data
            # subsample; any c near the true mean kills the
            # E[(x-c)^2] - E[x-c]^2 cancellation) + accumulator reset
            shift_ref[:] = jnp.broadcast_to(
                jnp.mean(tile, axis=0, keepdims=True), shift_ref.shape
            )
            acc_ref[:] = jnp.zeros_like(acc_ref)

        xs = tile - shift_ref[0, :][None, :]
        acc_ref[0] += jnp.sum(xs.reshape(-1, 8, C), axis=0)
        acc_ref[1] += jnp.sum(jnp.square(xs).reshape(-1, 8, C), axis=0)

        @pl.when(j == nt - 1)
        def _():
            s1 = jnp.sum(acc_ref[0], axis=0)  # (C,)
            s2 = jnp.sum(acc_ref[1], axis=0)
            m1 = s1 / n
            mean_ref[g, :] = m1 + shift_ref[0, :]
            var_ref[g, :] = jnp.maximum(s2 / n - m1 * m1, 0.0)

    # Mosaic's block rule needs the output's last-two block dims either
    # 8/128-divisible or FULL — a (1, C) row block over (G, C) with
    # G=2 fails both, so the whole (G, C) array rides one VMEM block
    # (tiny: 2*64 f32) and the last tile of each group stores its row
    # at a dynamic index.
    out_spec = pl.BlockSpec((G, C), lambda g, j: (0, 0))
    mean, var = pl.pallas_call(
        kernel,
        grid=(G, nt),
        in_specs=[pl.BlockSpec((1, tm, C), lambda g, j: (g, j, 0))],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((G, C), jnp.float32),
            jax.ShapeDtypeStruct((G, C), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, C), jnp.float32),  # s1/s2 partial sums
            pltpu.VMEM((8, C), jnp.float32),  # per-group shift (row 0)
        ],
        interpret=interpret,
    )(x3)
    return mean, var


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def group_stats(x: jax.Array, groups: int, interpret: bool = False):
    """Per-group batch mean/variance of x: (B, *spatial, C) grouped
    along batch into `groups` equal slices -> (mean, var), each
    (groups, C) f32; var is BIASED (/n), matching torch BatchNorm's
    normalization statistic.  Caller must check pallas_stats_active."""
    return _stats_fwd(x, groups, interpret)[0]


def _stats_fwd(x, groups, interpret):
    c = x.shape[-1]
    x3 = x.reshape(groups, -1, c)
    tm = _pick_tile(x3.shape[1], c)
    if tm is None:
        raise ValueError(
            f"group_stats: no row tile divides n={x3.shape[1]} at C={c} "
            "(gate with pallas_stats_active)"
        )
    mean, var = _stats_pallas(x3, tm=tm, interpret=interpret)
    return (mean, var), (x, mean)


def _stats_bwd(groups, interpret, res, g):
    x, mean = res
    gmean, gvar = g  # (G, C) each
    c = x.shape[-1]
    n = x.size // (groups * c)
    xg = x.reshape(groups, n, c)
    dx = (
        gmean[:, None, :]
        + 2.0 * (xg.astype(jnp.float32) - mean[:, None, :]) * gvar[:, None, :]
    ) / n
    return (dx.astype(x.dtype).reshape(x.shape),)


group_stats.defvjp(_stats_fwd, _stats_bwd)

"""Pixel-attentive consistency-mask ops, fully on-device.

The reference computes these masks in a serial numpy loop over the batch
with a GPU->CPU->GPU round-trip per step (utils/helpers.py:8-95).  Here
they are vectorized jnp ops that run inside the jitted train step; the
caller wraps them in `jax.lax.stop_gradient` (the reference detaches, so
no gradient flows through the masks).

Convention: segmentation maps are passed as (B, T, H, W) — the channel
axis of the model's (B, T, H, W, 1) output is squeezed by the caller.

Numerics matched to utils/helpers.py:

- `pixelwise_cyclic_variance` == measure_pixelwise_var_v2 (:8-67): build a
  14-frame cyclic clip cat(pred[0:8], flip_pred[1:7]), take the variance
  of a cyclic window of 3 or 5 frames around every position (the
  reference's np.take index tables at :36-47 reduce exactly to mod-14
  cyclic windows), fold the two half-cycles (var[i] + var[14-i], endpoints
  doubled, :53-57), then per-clip min-max normalize (:59-61).
- `pixelwise_gradient` == measure_pixelwise_gradient (:70-95): sigmoid,
  optional confidence clamping, double temporal np.gradient, per-clip
  min-max normalize.

The reference computes in float64 on the host; we compute in float32
on-device (documented deviation: these are detached loss *weights* in
[0, 1], so f32 resolution is ample).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _minmax_normalize(x: jax.Array, axes) -> jax.Array:
    """x -= min; x /= (max - min + 1e-7), per reference helpers.py:59-61, 88-89.

    The reference divides by (max' - min') of the *already shifted* array,
    i.e. by (max - min) of the original; the +1e-7 guards the all-constant
    case.
    """
    mn = jnp.min(x, axis=axes, keepdims=True)
    x = x - mn
    mx = jnp.max(x, axis=axes, keepdims=True)
    mn2 = jnp.min(x, axis=axes, keepdims=True)
    return x / (mx - mn2 + 1e-7)


def pixelwise_cyclic_variance(
    pred: jax.Array,
    flip_pred: jax.Array,
    *,
    window: int = 5,
    use_sigmoid: bool = False,
) -> jax.Array:
    """Cyclic temporal-variance attentive mask.

    Args:
      pred: (B, T=8, H, W) segmentation logits of the clip.
      flip_pred: (B, 8, H, W) logits of the flipped clip, flipped back.
      window: cyclic variance window, 3 or 5 (reference `--n_frames`).
      use_sigmoid: apply sigmoid first (reference `--predict_maps`).

    Returns:
      (B, 8, H, W) weights in [0, 1].
    """
    assert window in (3, 5), window
    if use_sigmoid:
        pred = jax.nn.sigmoid(pred)
        flip_pred = jax.nn.sigmoid(flip_pred)
    cyclic = jnp.concatenate([pred, flip_pred[:, 1:7]], axis=1)  # (B, 14, H, W)

    half = window // 2
    # stacked[k][:, t] = cyclic[:, (t + k - half) % 14] — mod-14 cyclic window.
    stacked = jnp.stack(
        [jnp.roll(cyclic, shift=half - k, axis=1) for k in range(window)], axis=0
    )
    var = jnp.var(stacked, axis=0)  # population variance, like np.var (ddof=0)

    # Fold half cycles: out[0] = 2 v[0]; out[7] = 2 v[7]; out[i] = v[i] + v[14 - i].
    folded = jnp.concatenate(
        [
            2.0 * var[:, 0:1],
            var[:, 1:7] + jnp.flip(var[:, 8:14], axis=1),
            2.0 * var[:, 7:8],
        ],
        axis=1,
    )  # (B, 8, H, W)
    return _minmax_normalize(folded, axes=(1, 2, 3))


def temporal_gradient(x: jax.Array, axis: int = 1) -> jax.Array:
    """np.gradient along one axis: central differences, one-sided edges."""
    n = x.shape[axis]
    # g[0] = x[1] - x[0]; g[i] = (x[i+1] - x[i-1]) / 2; g[n-1] = x[n-1] - x[n-2]
    upper = jnp.concatenate(
        [
            jax.lax.slice_in_dim(x, 1, 2, axis=axis),
            jax.lax.slice_in_dim(x, 2, n, axis=axis),
            jax.lax.slice_in_dim(x, n - 1, n, axis=axis),
        ],
        axis=axis,
    )
    lower = jnp.concatenate(
        [
            jax.lax.slice_in_dim(x, 0, 1, axis=axis),
            jax.lax.slice_in_dim(x, 0, n - 2, axis=axis),
            jax.lax.slice_in_dim(x, n - 2, n - 1, axis=axis),
        ],
        axis=axis,
    )
    shape = [1] * x.ndim
    shape[axis] = n
    denom = jnp.concatenate(
        [jnp.ones((1,)), 2.0 * jnp.ones((n - 2,)), jnp.ones((1,))]
    ).reshape(shape)
    return (upper - lower) / denom


def pixelwise_gradient(
    pred: jax.Array,
    *,
    conf_thresh_lower: float | None = None,
    conf_thresh_upper: float | None = None,
) -> jax.Array:
    """Gradient-smoothness attentive mask.

    Args:
      pred: (B, 8, H, W) segmentation logits.

    Returns:
      (B, 8, H, W) weights in [0, 1].
    """
    p = jax.nn.sigmoid(pred)
    if conf_thresh_lower is not None:
        p = jnp.where(p < conf_thresh_lower, 0.0, p)
    if conf_thresh_upper is not None:
        p = jnp.where(p > conf_thresh_upper, 1.0, p)
    g = temporal_gradient(temporal_gradient(p, axis=1), axis=1)
    return _minmax_normalize(g, axes=(1, 2, 3))

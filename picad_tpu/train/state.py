"""Train state: params + BN stats + optimizer state + step/rng."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array
    epoch: jax.Array  # last completed epoch (for resume)

    def learning_rate(self) -> float:
        return float(self.opt_state.hyperparams["learning_rate"])

    def with_learning_rate(self, lr: float) -> "TrainState":
        hp = dict(self.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return self.replace(opt_state=self.opt_state._replace(hyperparams=hp))


def create_train_state(
    model,
    optimizer: optax.GradientTransformation,
    *,
    rng: jax.Array,
    sample_input_shape=(1, 8, 224, 224, 3),
) -> TrainState:
    """Initialize model variables + optimizer state."""
    init_rng, dropout_rng, state_rng = jax.random.split(rng, 3)
    img = jnp.zeros(sample_input_shape, jnp.float32)
    b = sample_input_shape[0]
    variables = model.init(
        {"params": init_rng, "dropout": dropout_rng},
        img,
        jnp.zeros((b,), jnp.int32),
        jnp.ones((b,), jnp.float32),
        0,
        0,
        False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        rng=state_rng,
        epoch=jnp.zeros((), jnp.int32),
    )

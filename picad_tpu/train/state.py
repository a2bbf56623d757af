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
    # ReduceLROnPlateau host counters (train/optimizer.py), mirrored here
    # so checkpoints carry the FULL scheduler state — without them a
    # resumed run restarts the patience window and reduces the LR at the
    # wrong epoch (the live LR alone rides in opt_state.hyperparams).
    sched_best: jax.Array  # best metric seen (f32; inf = fresh)
    sched_bad: jax.Array  # consecutive non-improving epochs (i32)
    sched_cooldown: jax.Array  # cooldown epochs remaining (i32)

    def learning_rate(self) -> float:
        return float(self.opt_state.hyperparams["learning_rate"])

    def with_learning_rate(self, lr: float) -> "TrainState":
        hp = dict(self.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return self.replace(opt_state=self.opt_state._replace(hyperparams=hp))

    def with_scheduler(self, scheduler) -> "TrainState":
        """Mirror a ReduceLROnPlateau's counters into the state."""
        return self.replace(
            sched_best=jnp.asarray(scheduler.best, jnp.float32),
            sched_bad=jnp.asarray(scheduler.num_bad_epochs, jnp.int32),
            sched_cooldown=jnp.asarray(scheduler.cooldown_counter, jnp.int32),
        )

    def load_scheduler(self, scheduler) -> None:
        """Restore a ReduceLROnPlateau's counters (+ live LR) from the
        state (host-side; call after checkpoint restore)."""
        scheduler.best = float(self.sched_best)
        scheduler.num_bad_epochs = int(self.sched_bad)
        scheduler.cooldown_counter = int(self.sched_cooldown)
        scheduler.lr = self.learning_rate()


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
        sched_best=jnp.asarray(jnp.inf, jnp.float32),
        sched_bad=jnp.zeros((), jnp.int32),
        sched_cooldown=jnp.zeros((), jnp.int32),
    )

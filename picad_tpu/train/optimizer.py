"""Optimizer + LR scheduling.

- Adam(lr, weight_decay=0, eps=1e-6) matching main_ucf101.py:416; optax's
  adam with eps_root=0 reproduces torch Adam's bias-corrected update
  m_hat / (sqrt(v_hat) + eps) exactly.
- `ReduceLROnPlateau` re-implements torch's scheduler semantics
  (mode='min', rel threshold 1e-4, patience 5, factor 0.1, min_lr 1e-7 —
  main_ucf101.py:417) as a host-side object; the live LR rides in
  optax.inject_hyperparams so changing it does not retrace the step.
"""

from __future__ import annotations

import optax


def make_optimizer(
    lr: float = 1e-4, *, eps: float = 1e-6, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    if weight_decay:
        base = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, eps=eps, weight_decay=weight_decay
        )
    else:
        base = optax.inject_hyperparams(optax.adam)(learning_rate=lr, eps=eps)
    return base


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau('min') semantics."""

    def __init__(
        self,
        lr: float,
        *,
        factor: float = 0.1,
        patience: int = 5,
        min_lr: float = 1e-7,
        threshold: float = 1e-4,
        cooldown: int = 0,
    ):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.cooldown = cooldown
        self.best = float("inf")
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def step(self, metric: float) -> float:
        """Feed an epoch metric; returns the (possibly reduced) LR."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1

        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr

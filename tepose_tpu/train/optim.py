"""Optimisers and LR scheduling.

ref: lib/utils/utils.py:145-152 (get_optimizer: Adam/SGD factory) and
train.py:86-100 (torch ReduceLROnPlateau on PA-MPJPE, patience
cfg.TRAIN.LR_PATIENCE).

Optimisers are optax chains wrapped in `inject_hyperparams` so the learning
rate lives in the optimiser *state* — the plateau scheduler (host-side, one
decision per epoch) mutates it without recompiling the jitted train step.

torch-matching details:
  * Adam weight decay is classic L2 (decay added to the gradient BEFORE the
    moment updates), not AdamW.
  * SGD uses torch momentum semantics (buf = mu*buf + grad; step -lr*buf).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import optax


def make_optimizer(name: str, lr: float, weight_decay: float = 0.0,
                   momentum: float = 0.9) -> optax.GradientTransformation:
    name = name.lower()
    if name == "adam":
        def factory(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.scale(-1.0 * learning_rate),
            )
    elif name == "sgd":
        def factory(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.trace(decay=momentum, nesterov=False),
                optax.scale(-1.0 * learning_rate),
            )
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    return optax.inject_hyperparams(factory)(learning_rate=lr)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    import jax.numpy as jnp

    cur = opt_state.hyperparams["learning_rate"]
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=getattr(cur, "dtype", jnp.float32))
    return opt_state


@dataclasses.dataclass
class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics (mode='min',
    threshold_mode='rel', the defaults used at train.py:86-100)."""

    patience: int = 5
    factor: float = 0.1
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: Optional[float] = None
    num_bad_epochs: int = 0

    def step(self, metric: float, lr: float) -> float:
        """Feed the epoch metric; returns the (possibly reduced) lr."""
        if self.best is None or metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            return max(lr * self.factor, self.min_lr)
        return lr

    def state_dict(self) -> dict:
        return {"patience": self.patience, "factor": self.factor,
                "threshold": self.threshold, "min_lr": self.min_lr,
                "best": self.best, "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        for k, v in d.items():
            setattr(self, k, v)

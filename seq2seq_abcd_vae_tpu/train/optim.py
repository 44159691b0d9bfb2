"""Optimizer and LR scheduling.

The reference trains with torch SGD (momentum configurable, default 0.0),
global-norm gradient clipping, and ReduceLROnPlateau stepped on the mean
validation loss (ABCD-VAE/learning.py:245-288).  optax supplies SGD and
clipping; ReduceLROnPlateau does not exist in optax, so it is implemented
here with torch-parity semantics (rel threshold 1e-4, factor 0.1,
cooldown 0) including the state-dict keys, and the
``best = inf`` reset at pretraining end (learning.py:283-286).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Any

import optax


@functools.lru_cache(maxsize=None)
def make_optimizer(learning_rate: float, momentum: float,
                   gradient_clip: float) -> optax.GradientTransformation:
    """Global-norm clip -> SGD(momentum), matching
    torch.nn.utils.clip_grad_norm_ + torch.optim.SGD
    (learning.py:161-163,251-256).  The learning rate is injected as a
    mutable hyperparameter so the plateau scheduler can change it without
    recompiling.

    Memoized: the returned transform is pure (all state lives in
    opt_state), and the learner passes it as a STATIC jit argument —
    returning a fresh closure tuple per Learner would miss the in-process
    jit cache and recompile the whole train step on every resume /
    re-instantiation (the dominant cost of the multichip dryrun's
    back-to-back CLI invocations)."""
    return optax.inject_hyperparams(
        _clipped_sgd, static_args=("momentum", "gradient_clip"))(
        learning_rate=learning_rate, momentum=momentum,
        gradient_clip=gradient_clip)


def _clipped_sgd(learning_rate, momentum, gradient_clip):
    return optax.chain(
        optax.clip_by_global_norm(gradient_clip),
        optax.sgd(learning_rate, momentum=momentum if momentum else None),
    )


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def with_learning_rate(opt_state, lr: float):
    """Functional update of the injected learning-rate hyperparameter
    (host-side, between epochs).  Returns a new opt_state; the new scalar
    is explicitly placed with the old one's sharding so the state keeps
    its single-device or mesh placement after a plateau reduction."""
    import jax
    import jax.numpy as jnp

    old = opt_state.hyperparams["learning_rate"]
    new = jnp.asarray(lr, dtype=old.dtype)
    if isinstance(old, jax.Array):
        new = jax.device_put(new, old.sharding)
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = new
    return opt_state._replace(hyperparams=hyperparams)


@dataclass
class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau parity (mode='min').

    step() consumes a metric and the current lr, returns the (possibly
    reduced) lr.
    """
    factor: float = 0.1
    patience: int = 10
    threshold: float = 1e-4
    threshold_mode: str = "rel"
    cooldown: int = 0
    min_lr: float = 0.0
    eps: float = 1e-8
    best: float = math.inf
    num_bad_epochs: int = 0
    cooldown_counter: int = 0
    last_epoch: int = 0
    num_reductions: int = 0

    def is_better(self, current: float) -> bool:
        if self.threshold_mode == "rel":
            return current < self.best * (1.0 - self.threshold)
        return current < self.best - self.threshold

    def step(self, metric: float, lr: float) -> float:
        current = float(metric)
        self.last_epoch += 1
        if self.is_better(current):
            self.best = current
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_lr = max(lr * self.factor, self.min_lr)
            if lr - new_lr > self.eps:
                lr = new_lr
                self.num_reductions += 1
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return lr

    def reset_best(self) -> None:
        """'Delete the best during pretraining' (learning.py:284-286)."""
        self.best = math.inf

    def state_dict(self) -> dict[str, Any]:
        return {k: getattr(self, k) for k in (
            "factor", "patience", "threshold", "threshold_mode", "cooldown",
            "min_lr", "eps", "best", "num_bad_epochs", "cooldown_counter",
            "last_epoch", "num_reductions")}

    def load_state_dict(self, state: dict[str, Any]) -> None:
        for k, v in state.items():
            setattr(self, k, v)

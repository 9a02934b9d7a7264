"""Optimizer + schedules with torch-parity semantics.

- ``torch_adam``: Adam with *coupled* L2 weight decay (decay added to the
  gradient before the moment updates), matching ``torch.optim.Adam``'s
  ``weight_decay`` — the optimizer every reference entry point uses
  (train.py:331-335, cross_validation.py:93-97). optax's ``adamw`` is
  decoupled, so we compose the torch behavior explicitly. Both the learning
  rate and decay are injected hyperparameters so plateau scheduling never
  triggers a recompile.
- ``ReduceLROnPlateau``: host-side epoch-boundary controller replicating
  ``torch.optim.lr_scheduler.ReduceLROnPlateau`` (mode max, rel threshold)
  as configured at train.py:338-345 / cross_validation.py:98-100.
- ``EarlyStopping``: patience counter on max-mode score (utils.py:174-190).

Both controllers are pure Python run between jitted epochs (SURVEY.md §7
hard part 7): the LR enters the device graph as a scalar hyperparameter.
"""

from __future__ import annotations

import optax


def _torch_adam_chain(learning_rate: float, weight_decay: float = 0.0,
                      b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),  # grad += wd * param (coupled)
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(learning_rate),
    )


def torch_adam(learning_rate: float = 1e-3, weight_decay: float = 0.0,
               b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """torch.optim.Adam-equivalent optax transform with injectable
    learning_rate / weight_decay hyperparameters."""
    return optax.inject_hyperparams(_torch_adam_chain)(
        learning_rate=learning_rate, weight_decay=weight_decay, b1=b1, b2=b2,
        eps=eps)


def _torch_adamw_chain(learning_rate: float, weight_decay: float = 0.0,
                       b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    # torch.optim.AdamW: p <- p - lr*(m_hat/(sqrt(v_hat)+eps) + wd*p)
    # (DECOUPLED decay, scaled by lr) — optax.adamw's composition.
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


def _torch_sgd_chain(learning_rate: float, weight_decay: float = 0.0,
                     momentum: float = 0.9, nesterov: bool = False):
    # torch.optim.SGD (dampening=0): buf = mu*buf + g(+wd*p);
    # update = buf (or g + mu*buf for nesterov) — optax.trace semantics.
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=nesterov),
        optax.scale_by_learning_rate(learning_rate),
    )


def _lamb_chain(learning_rate: float, weight_decay: float = 0.0,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-6):
    # optax.lamb's composition (per-layer trust ratio on the Adam update).
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_trust_ratio(),
        optax.scale_by_learning_rate(learning_rate),
    )


_OPTIMIZER_CHAINS = {
    "adam": _torch_adam_chain,
    "adamw": _torch_adamw_chain,
    "sgd": _torch_sgd_chain,
    "lamb": _lamb_chain,
}


def make_optimizer(name: str = "adam", learning_rate: float = 1e-3,
                   weight_decay: float = 0.0, **kwargs):
    """Optimizer factory (config key ``optimizer``; capability beyond the
    reference, which hard-codes Adam at train.py:331-335).

    Every optimizer is an ``optax.inject_hyperparams`` chain whose
    ``learning_rate`` / ``weight_decay`` are injected state, so the
    plateau controller, epoch pipelining and checkpoint restore work
    identically for all of them (no recompiles on LR cuts). ``adam`` is
    torch-coupled-decay Adam (the reference's), ``adamw``/``sgd`` match
    their torch counterparts, ``lamb`` follows optax."""
    try:
        chain = _OPTIMIZER_CHAINS[name.lower()]
    except KeyError:
        raise ValueError(
            f"Unknown optimizer '{name}'. "
            f"Available: {sorted(_OPTIMIZER_CHAINS)}") from None
    return optax.inject_hyperparams(chain)(
        learning_rate=learning_rate, weight_decay=weight_decay, **kwargs)


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in an inject_hyperparams state
    (same pytree structure → no recompilation)."""
    import jax.numpy as jnp
    old = opt_state.hyperparams["learning_rate"]
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=old.dtype)
    return opt_state


class ReduceLROnPlateau:
    """torch ReduceLROnPlateau parity (the subset the reference uses:
    mode='max', threshold_mode='rel', cooldown=0)."""

    def __init__(self, initial_lr: float, mode: str = "max", factor: float = 0.5,
                 patience: int = 3, threshold: float = 1e-4,
                 min_lr: float = 0.0):
        assert mode in ("max", "min")
        self.lr = float(initial_lr)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = None
        self.num_bad_epochs = 0

    def _is_better(self, current: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "max":
            return current > self.best * (1.0 + self.threshold) if self.best >= 0 \
                else current > self.best * (1.0 - self.threshold)
        return current < self.best * (1.0 - self.threshold) if self.best >= 0 \
            else current < self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        """Feed the epoch metric; returns the (possibly reduced) LR."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad_epochs = 0
        return self.lr

    def safe_horizon(self) -> int:
        """Epoch-pipelining lookahead bound: how many upcoming epochs are
        GUARANTEED to train at the current LR, whatever their metrics.

        From bad-count b, an LR cut needs the count to exceed ``patience``,
        which takes at least ``patience - b + 1`` more steps even if every
        one is bad — and a cut at step j only affects epoch j+1. So the
        next ``patience - b + 1`` epochs can be dispatched before their
        metrics are fetched with zero mis-speculation (train_model's
        windowed loop, segtpu/train/loop.py). At the LR floor no further
        change is possible at all."""
        if self.lr <= self.min_lr:
            return 1 << 30
        return self.patience - self.num_bad_epochs + 1


class EarlyStopping:
    """Patience counter on a max-mode score (utils.py:174-190)."""

    def __init__(self, patience: int = 10, min_delta: float = 0.001):
        self.patience = patience
        self.min_delta = min_delta
        self.counter = 0
        self.best_score = None
        self.early_stop = False

    def step(self, current_score: float) -> bool:
        if self.best_score is None or current_score > self.best_score + self.min_delta:
            self.best_score = current_score
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        return self.early_stop

    def safe_horizon(self) -> int:
        """Epoch-pipelining lookahead bound: how many upcoming epochs may
        be dispatched such that a stop decision can only land on the LAST
        of them (so none of the dispatched epochs is wasted). From counter
        c the stop needs at least ``patience - c`` more bad steps."""
        return max(1, self.patience - self.counter)

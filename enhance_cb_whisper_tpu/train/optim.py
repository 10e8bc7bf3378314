"""Optimizers and LR schedules (optax), matching the reference's setups.

* paper 1: Adam(betas=(0.9, 0.99)) + StepLR(step_size=lr_step, gamma=0.1),
  one optimizer normally, three (features/classifier/discriminator) under
  adversarial training (src/model/model.py:309-339) — expressed as one
  ``optax.multi_transform`` over param labels;
* paper 2: AdamW param groups (resnet vs projectors) +
  CosineAnnealingLR(T_max=max_epochs, eta_min=1e-6)
  (src/efficient_kws/model.py:684-740).

Schedules are per-EPOCH like torch's (the reference steps them at epoch
end): optimizers are built with ``optax.inject_hyperparams`` so the trainer
can write ``opt_state.hyperparams['learning_rate'] = schedule(epoch)`` at
each epoch boundary without rebuilding any state.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
import optax


def step_lr(base_lr: float, step_size: int, gamma: float = 0.1) -> Callable:
    """torch.optim.lr_scheduler.StepLR equivalent over the epoch index."""

    def schedule(epoch):
        return base_lr * gamma ** (epoch // step_size)

    return schedule


def cosine_lr(base_lr: float, t_max: int, eta_min: float = 1e-6) -> Callable:
    """torch CosineAnnealingLR over the epoch index."""

    def schedule(epoch):
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * jnp.minimum(epoch, t_max) / t_max)
        )

    return schedule


def make_adam(
    learning_rate: float,
    beta_1: float = 0.9,
    beta_2: float = 0.99,
    weight_decay: float = 0.0,
    adamw: bool = False,
) -> optax.GradientTransformation:
    """Adam/AdamW with an injectable learning rate (epoch schedules write
    ``opt_state.hyperparams['learning_rate']``)."""

    @optax.inject_hyperparams
    def _make(learning_rate):
        if adamw:
            return optax.adamw(learning_rate, b1=beta_1, b2=beta_2, weight_decay=weight_decay)
        tx = optax.adam(learning_rate, b1=beta_1, b2=beta_2)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
        return tx

    return _make(learning_rate)


def set_learning_rate(opt_state, learning_rate):
    """Write the injected learning rate (handles multi_transform states)."""
    if hasattr(opt_state, "hyperparams"):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(learning_rate)
        return opt_state
    raise TypeError("optimizer state does not carry injected hyperparams")


def make_multi_optimizer(
    label_fn: Callable,
    optimizers: Dict[str, optax.GradientTransformation],
) -> optax.GradientTransformation:
    """Per-module optimizers (the adversarial 3-optimizer setup) as one
    transform; ``label_fn`` maps the params pytree to label strings."""
    return optax.multi_transform(optimizers, label_fn)

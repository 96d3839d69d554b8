"""Optimizers and LR schedules (optax) — reference utils.py:83-123 semantics.

The reference adjusts LR once per *epoch* (cosine to eta_min = lr*rate^3, or
step decay at lr_decay_epochs) plus an optional per-batch linear warmup over
the first ``warm_epochs`` epochs.  Here the schedule is a pure function of
the global step (steps_per_epoch supplied), composed with SGD(momentum 0.9,
weight decay) or Adam via optax.  Weight decay is applied torch-style
(decoupled L2 added to the gradient before momentum, matching
``optim.SGD(weight_decay=...)`` / ``optim.Adam(weight_decay=...)``).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import optax

__all__ = ["make_lr_schedule", "make_optimizer"]


def make_lr_schedule(learning_rate: float, epochs: int, steps_per_epoch: int,
                     cosine: bool = True, lr_decay_rate: float = 0.1,
                     lr_decay_epochs: Sequence[int] = (700, 800, 900),
                     warm: bool = False, warm_epochs: int = 10,
                     warmup_from: float = 0.01,
                     warmup_to: float | None = None):
    """Step-indexed LR schedule replicating adjust_learning_rate +
    warmup_learning_rate (utils.py:83-104).

    Epoch-granular decay: the decayed LR is computed from the (1-based) epoch
    number and held constant within the epoch, exactly as the reference does.
    """
    if warmup_to is None:
        if cosine:
            eta_min = learning_rate * lr_decay_rate ** 3
            warmup_to = eta_min + (learning_rate - eta_min) * (
                1 + math.cos(math.pi * warm_epochs / epochs)) / 2
        else:
            warmup_to = learning_rate

    decay_epochs = tuple(lr_decay_epochs)

    def schedule(step):
        epoch = step // steps_per_epoch + 1  # reference epochs are 1-based
        batch_id = step % steps_per_epoch
        if cosine:
            eta_min = learning_rate * lr_decay_rate ** 3
            lr = eta_min + (learning_rate - eta_min) * (
                1 + jnp.cos(jnp.pi * epoch / epochs)) / 2
        else:
            nsteps = sum((epoch > e).astype(jnp.int32) for e in decay_epochs) \
                if decay_epochs else 0
            lr = learning_rate * lr_decay_rate ** nsteps
        if warm:
            p = (batch_id + (epoch - 1) * steps_per_epoch) / (
                warm_epochs * steps_per_epoch)
            warm_lr = warmup_from + p * (warmup_to - warmup_from)
            lr = jnp.where(epoch <= warm_epochs, warm_lr, lr)
        return lr

    return schedule


def make_optimizer(schedule, adam: bool = False, momentum: float = 0.9,
                   weight_decay: float = 5e-4) -> optax.GradientTransformation:
    """SGD(momentum, wd) or Adam(wd), reference set_optimizer
    (utils.py:106-123)."""
    if adam:
        return optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else
            optax.identity(),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(schedule),
        )
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else
        optax.identity(),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    )

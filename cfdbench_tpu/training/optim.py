"""Optimizers and schedules.

The reference trainers use plain ``Adam(lr)`` with a per-epoch
``StepLR(step_size, gamma)`` (``src/train_auto.py:213-216, 280``).
Here: optax.adam driven by a staircase schedule over *global steps*,
decaying every ``lr_step_size`` epochs — identical trajectory given
the fixed number of optimizer steps per epoch.
"""

from __future__ import annotations

import optax


def step_lr_schedule(
    lr: float, gamma: float, step_size_epochs: int, steps_per_epoch: int
):
    """lr * gamma^(epoch // step_size), epoch = step // steps_per_epoch."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return lr * gamma ** (epoch // step_size_epochs)

    return schedule


def make_adam(
    lr: float,
    gamma: float = 0.9,
    lr_step_size: int = 1,
    steps_per_epoch: int = 1,
    weight_decay: float = 0.0,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    schedule = step_lr_schedule(lr, gamma, lr_step_size, steps_per_epoch)
    if weight_decay > 0:
        tx = optax.adamw(schedule, weight_decay=weight_decay)
    else:
        tx = optax.adam(schedule)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx

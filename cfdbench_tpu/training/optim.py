"""Optimizers and schedules.

The reference trainers use plain ``Adam(lr)`` with a per-epoch
``StepLR(step_size, gamma)`` (``src/train_auto.py:213-216, 280``).
Here: optax.adam driven by a staircase schedule over *global steps*,
decaying every ``lr_step_size`` epochs — identical trajectory given
the fixed number of optimizer steps per epoch.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


def step_lr_schedule(
    lr: float, gamma: float, step_size_epochs: int, steps_per_epoch: int
):
    """lr * gamma^(epoch // step_size), epoch = step // steps_per_epoch."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return lr * gamma ** (epoch // step_size_epochs)

    return schedule


class ScaleByAdamCompactState(NamedTuple):
    count: chex.Array
    mu: chex.ArrayTree
    nu: chex.ArrayTree


def scale_by_adam_compact(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    state_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """Adam whose moment states are STORED in ``state_dtype`` (bf16 by
    default) while all update math runs in f32.

    Motivation (BASELINE.md §anatomy): at hidden 256 the flagship FNO
    train step is HBM-bound and Adam's f32 m/v on the 604 MB spectral
    master weights account for ~4.2 GB of traffic per step; halving
    the moment bytes targets exactly that. The f32 master *weights*
    are untouched — only the optimizer's own state is compacted, so
    the weight trajectory degrades only through bf16 rounding of m/v
    (~3 decimal digits), which stochastic-optimization noise dwarfs at
    these batch sizes.
    """

    def init(params):
        zeros = lambda p: jnp.zeros(  # noqa: E731
            p.shape, dtype=state_dtype
        )
        return ScaleByAdamCompactState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        mu32 = jax.tree.map(
            lambda g, m: b1 * m.astype(jnp.float32) + (1 - b1) * g,
            grads, state.mu,
        )
        nu32 = jax.tree.map(
            lambda g, v: b2 * v.astype(jnp.float32) + (1 - b2) * g * g,
            grads, state.nu,
        )
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        updates = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps),
            mu32, nu32,
        )
        cast = lambda t: jax.tree.map(  # noqa: E731
            lambda x: x.astype(state_dtype), t
        )
        return updates, ScaleByAdamCompactState(
            count=count, mu=cast(mu32), nu=cast(nu32)
        )

    return optax.GradientTransformation(init, update)


def make_adam(
    lr: float,
    gamma: float = 0.9,
    lr_step_size: int = 1,
    steps_per_epoch: int = 1,
    weight_decay: float = 0.0,
    grad_accum_steps: int = 1,
    opt_state: str = "f32",
) -> optax.GradientTransformation:
    """``opt_state``: "f32" (stock Adam), "bf16" (moments stored bf16
    — ``scale_by_adam_compact``), or "factored" (adafactor's factored
    second moment). The non-f32 variants exist for wide models whose
    step is optimizer-traffic-bound (BASELINE.md §anatomy); the
    trainers expose this as ``--opt_state_dtype``."""
    # Under gradient accumulation optax.MultiSteps advances the inner
    # schedule once per optimizer step (every k micro-batches), so the
    # per-epoch step count must be in optimizer-step units for the
    # staircase to decay on epoch boundaries.
    steps_per_epoch = max(1, steps_per_epoch // max(1, grad_accum_steps))
    schedule = step_lr_schedule(lr, gamma, lr_step_size, steps_per_epoch)
    if opt_state == "bf16":
        parts = [scale_by_adam_compact()]
        if weight_decay > 0:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_learning_rate(schedule))
        tx = optax.chain(*parts)
    elif opt_state == "factored":
        tx = optax.adafactor(
            learning_rate=schedule,
            weight_decay_rate=weight_decay or None,
        )
    elif opt_state == "f32":
        if weight_decay > 0:
            tx = optax.adamw(schedule, weight_decay=weight_decay)
        else:
            tx = optax.adam(schedule)
    else:
        raise ValueError(
            f"opt_state {opt_state!r}: choose f32 | bf16 | factored"
        )
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx

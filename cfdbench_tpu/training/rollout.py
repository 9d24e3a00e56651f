"""Autoregressive multi-step rollout as a compiled scan.

The reference rolls out sequentially in Python at batch size 1, one
case at a time (``src/test_multistep.py:135-177``,
``src/models/fno/fno2d.py:269-295``) — its biggest performance gap.
Here the rollout is a single jitted ``lax.scan`` over steps with all
cases batched along the leading axis; the whole 20-step × N-case
rollout is one XLA program with a donated carry.

Semantics preserved (including reference quirks, SURVEY.md §2.3):
- DeepONet-family models feed back a 1-channel (u-only) prediction.
- ResNet's frame list includes the initial frame
  (``src/models/resnet.py:229-235``), shifting its metric alignment.
- Per-step metrics are computed on the masked u channel against the
  raw data frame at index ``step`` (``test_multistep.py:152-177``).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def make_rollout_fn(
    apply_fn: Callable,
    steps: int,
    include_initial: bool = False,
    stochastic: bool = False,
    seed: int = 0,
) -> Callable:
    """Build a jitted rollout: (params, frame0, case_params, mask) →
    (steps, B, H, W, C) stacked predictions.

    ``apply_fn(params, frame, case_params, mask) -> next_frame`` must
    preserve the frame's shape (the trainer wraps point models so their
    1-channel full-field prediction is the carry).

    ``stochastic=True`` changes the contract to
    ``apply_fn(params, frame, case_params, mask, key)`` and feeds a
    fresh PRNG key each step — used by the diffusion family, whose
    per-step prediction is a DDPM sampling run (the reference chains
    ``generate`` with fresh noise, ``src/models/pixel_diffusion.py:139-154``).
    """

    def scan_step(carry, key, params, case_params, mask):
        if stochastic:
            nxt = apply_fn(params, carry, case_params, mask, key)
        else:
            nxt = apply_fn(params, carry, case_params, mask)
        # Models whose internals promote dtype (the point family's f32
        # lattice coords, models/point.py::_lattice_xy) must not widen
        # the carry — lax.scan requires carry-in == carry-out types,
        # and a bf16-storage rollout should keep its feedback bf16.
        # No-op when dtypes already match.
        nxt = nxt.astype(carry.dtype)
        return nxt, nxt

    @functools.partial(jax.jit, donate_argnums=())
    def rollout(params, frame0, case_params, mask):
        step = functools.partial(
            scan_step, params=params, case_params=case_params, mask=mask
        )
        xs = (
            jax.random.split(jax.random.PRNGKey(seed), steps)
            if stochastic
            else None
        )
        _, frames = jax.lax.scan(step, frame0, xs, length=steps)
        if include_initial:
            frames = jnp.concatenate([frame0[None], frames[:-1]], axis=0)
        return frames

    return rollout


@jax.jit
def _per_step_metrics(preds_u, labels_u, mask):
    """Masked-u metrics per (step, case): mse / nmse / mae over the full
    grid after masking (``test_multistep.py:73-82, 162-172``)."""
    p = preds_u * mask
    l = labels_u * mask
    err = p - l
    mse = jnp.mean(jnp.square(err), axis=(-2, -1))
    nmse = mse / jnp.mean(jnp.square(l), axis=(-2, -1))
    mae = jnp.mean(jnp.abs(err), axis=(-2, -1))
    return mse, nmse, mae


def multistep_metrics(
    pred_frames: jnp.ndarray,  # (steps, B, H, W, C)
    label_frames: np.ndarray,  # (B, steps, H, W, >=1) ground-truth
    mask: np.ndarray,  # (B, H, W) or (B, H, W, 1)
    case_weights: np.ndarray = None,  # (B,) 1=real case, 0=dp padding
) -> List[Dict[str, float]]:
    """Per-step metric dicts averaged over cases (reference
    ``combine_dicts``: mean of per-case values, including per-case
    nmse). ``case_weights`` excludes dp-padding replicas appended to
    round the case count up to a multiple of the data-axis size —
    weighted means over real cases are identical to the unpadded
    single-device means."""
    preds_u = jnp.transpose(pred_frames[..., 0], (1, 0, 2, 3))  # (B,S,H,W)
    labels_u = jnp.asarray(label_frames[..., 0])
    m = np.asarray(mask)
    if m.ndim == 4:
        m = m[..., 0]
    m = jnp.asarray(m)[:, None]  # (B, 1, H, W)
    mse, nmse, mae = _per_step_metrics(preds_u, labels_u, m)
    mse, nmse, mae = map(np.asarray, (mse, nmse, mae))
    w = (
        None if case_weights is None
        else np.asarray(case_weights, np.float64)
    )
    out = []
    for s in range(preds_u.shape[1]):
        out.append(
            dict(
                mse=float(np.average(mse[:, s], weights=w)),
                nmse=float(np.average(nmse[:, s], weights=w)),
                mae=float(np.average(mae[:, s], weights=w)),
            )
        )
    return out


def pad_case_features(
    all_features: List[np.ndarray], steps: int
) -> np.ndarray:
    """Stack per-case (T, H, W, 3) arrays into (B, steps, H, W, 3),
    repeating the final frame of short cases (steady-state assumption,
    ``test_multistep.py:204-212``)."""
    padded = []
    for feats in all_features:
        T = feats.shape[0]
        if T < steps:
            reps = np.repeat(feats[-1:], steps - T, axis=0)
            feats = np.concatenate([feats, reps], axis=0)
        padded.append(feats[:steps])
    return np.stack(padded)

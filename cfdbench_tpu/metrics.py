"""Loss / metric semantics matching the CFDBench reference exactly.

Reference semantics (``src/models/loss.py:22-37``):

- ``mse``  = mean((preds - labels)**2) over every element
- ``rmse`` = sqrt(mse)
- ``mae``  = mean(|preds - labels|)
- ``nmse`` = mse / mean(labels**2)          (only when ``normalize``)

Masking in the reference happens *before* the loss: conv-family models
multiply ``preds`` and ``labels`` by the geometry mask and then take the
plain mean over all pixels (``src/models/fno/fno2d.py:232-237``). We keep
that convention: these functions never mask internally.

This module adds one TPU-motivated generalization: optional per-sample
weights. Batches are padded to a static shape before being fed to a
jitted step (XLA requires static shapes); weights of 0 on padding rows
make every metric *bit-identical* to computing over the unpadded batch.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


def score_dict(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    normalize: bool,
    sample_weights: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Compute the reference loss dict.

    Args:
        preds / labels: same shape, leading axis = batch.
        normalize: include ``nmse`` (reference ``MseLoss(normalize=True)``).
        sample_weights: optional ``(batch,)`` 0/1 weights. ``None`` means
            all ones (exact reference behavior).
    """
    err = preds - labels
    if sample_weights is None:
        mse = jnp.mean(jnp.square(err))
        mae = jnp.mean(jnp.abs(err))
        lab2 = jnp.mean(jnp.square(labels))
        lab1 = jnp.mean(jnp.abs(labels))
    else:
        w = sample_weights.reshape((-1,) + (1,) * (err.ndim - 1))
        denom = jnp.sum(w) * (err.size // err.shape[0])
        denom = jnp.maximum(denom, 1.0)
        mse = jnp.sum(w * jnp.square(err)) / denom
        mae = jnp.sum(w * jnp.abs(err)) / denom
        lab2 = jnp.sum(w * jnp.square(labels)) / denom
        lab1 = jnp.sum(w * jnp.abs(labels)) / denom
    result = dict(mse=mse, rmse=jnp.sqrt(mse), mae=mae)
    if normalize:
        # Guard ONLY the exactly-all-zero-labels case (all-padding
        # batches, or a genuinely zero label field, where the
        # reference's 0/0 would poison the device-side epoch stack
        # with NaN) — detected via max|label|, which cannot underflow.
        # Keying on the summed energy instead would misfire when
        # squares of tiny-but-nonzero labels flush to zero (FTZ): that
        # must stay the reference's unguarded division (inf), not a
        # silent "perfect" 0. For nonzero labels the division by the
        # true energy is bit-exact vs the reference. The
        # where-in-denominator keeps gradients NaN-free on the guarded
        # branch when nmse/nmae is the training loss.
        absmax = jnp.max(
            jnp.abs(labels) if sample_weights is None
            else w * jnp.abs(labels)
        )
        valid = absmax > 0
        one = jnp.asarray(1.0, lab2.dtype)
        zero = jnp.asarray(0.0, lab2.dtype)
        result["nmse"] = jnp.where(
            valid, mse / jnp.where(valid, lab2, one), zero
        )
        result["nmae"] = jnp.where(
            valid, mae / jnp.where(valid, lab1, one), zero
        )
    return result


def score_names(normalize: bool) -> list:
    """Mirror of ``MseLoss.get_score_names`` (``src/models/loss.py:14-20``)."""
    names = ["mse", "rmse", "mae"]
    if normalize:
        names.append("nmse")
    return names


class LossFn:
    """Callable loss object mirroring the reference ``MseLoss``.

    ``loss_name_to_fn`` (``src/models/loss.py:40-50``) maps ``"mse"`` to a
    non-normalizing loss and ``"nmse"`` to a normalizing one; other names
    raise. We additionally support ``"mae"``/``"nmae"`` (advertised but
    unimplemented in the reference, defect #7 in SURVEY.md §8) — the
    training objective key is carried in :attr:`objective`.
    """

    def __init__(self, normalize: bool, objective: str):
        self.normalize = normalize
        self.objective = objective

    def __call__(self, preds, labels, sample_weights=None):
        return score_dict(
            preds, labels, self.normalize, sample_weights=sample_weights
        )

    def get_score_names(self):
        names = score_names(self.normalize)
        # The reference's name list never includes nmae (defect #7);
        # only the nmae objective extends it, so the standard nmse
        # score contract (mse/rmse/mae/nmse) is untouched.
        if self.objective == "nmae" and "nmae" not in names:
            names.append("nmae")
        return names


def loss_name_to_fn(name: str, masked: bool = False) -> LossFn:
    """Mirror of ``src/models/loss.py:40-50`` with mae/nmae supported."""
    name = name.lower()
    if masked:
        raise NotImplementedError("masked loss variant is not implemented")
    if name == "mse":
        return LossFn(normalize=False, objective="mse")
    if name == "nmse":
        return LossFn(normalize=True, objective="nmse")
    if name == "mae":
        return LossFn(normalize=False, objective="mae")
    if name == "nmae":
        # Truly normalized MAE (mae / mean|labels|) — the reference
        # advertises nmae but never implements it (defect #7).
        return LossFn(normalize=True, objective="nmae")
    raise NotImplementedError(f"unknown loss name: {name}")

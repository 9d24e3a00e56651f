"""Serving export: serialize compiled model functions as portable
StableHLO artifacts (``jax.export``).

The reference has no deployment story — inference means loading a
torch checkpoint into Python (``src/test_multistep.py:224-230``). The
TPU-native path exports the *jitted computation itself* (weights baked
in as constants): the artifact is a versioned StableHLO program that a
serving process can deserialize and call without the model code, the
flax definition, or the checkpoint — only jax and the artifact.

Two entry points:
- :func:`export_predict` — the single-step next-frame function
  ``f(frame, case_params, mask) -> frame`` (streaming serving).
- :func:`export_rollout` — the full N-step autoregressive rollout as
  one program (batch inference; the scan is inside the artifact).

Shapes are fixed at export (XLA's static-shape contract); export one
artifact per serving batch size, like any compiled-serving system.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _declare_single_device_trace():
    """Exported programs are single-device: the batch axis the trace
    sees is the true per-chip batch. Reset the spectral auto-backend
    divisor in case a dp>1 training mesh was built earlier in this
    process (ADVICE r4 #1)."""
    from ..ops import spectral

    spectral.set_data_shards(1)


def _spec(shape):
    return jax.ShapeDtypeStruct(tuple(shape), jnp.float32)


def export_predict(
    task, params, path: Path, batch: int, height: int, width: int,
    n_case_params: int, model_state=None, platforms=None,
) -> int:
    """Serialize ``predict_frame`` with the weights closed over.
    Returns the artifact size in bytes.

    ``platforms``: lowering targets baked into the artifact (e.g.
    ``("tpu", "cpu")``); defaults to the exporting process's backend —
    artifacts are platform-specific, so export for every platform the
    serving fleet runs on."""

    def f(frame, case_params, mask):
        return task.predict_frame(
            params, frame, case_params, mask,
            model_state=model_state or {},
        )

    _declare_single_device_trace()
    exp = jax_export.export(
        jax.jit(f), platforms=platforms
    )(
        _spec((batch, height, width, task.feedback_channels)),
        _spec((batch, n_case_params)),
        _spec((batch, height, width, 1)),
    )
    blob = exp.serialize()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(blob)
    return len(blob)


def export_rollout(
    task, params, path: Path, batch: int, height: int, width: int,
    n_case_params: int, steps: int = 20, model_state=None,
    platforms=None,
) -> int:
    """Serialize the full N-step rollout (scan inside the program).
    Returns the artifact size in bytes."""
    from ..training.rollout import make_rollout_fn

    rollout = make_rollout_fn(
        lambda p, f, cp, m: task.predict_frame(
            p, f, cp, m, model_state=model_state or {}
        ),
        steps=steps,
    )

    def f(frame0, case_params, mask):
        return rollout(params, frame0, case_params, mask)

    _declare_single_device_trace()
    exp = jax_export.export(
        jax.jit(f), platforms=platforms
    )(
        _spec((batch, height, width, task.feedback_channels)),
        _spec((batch, n_case_params)),
        _spec((batch, height, width, 1)),
    )
    blob = exp.serialize()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(blob)
    return len(blob)


def load_exported(path: Path):
    """Deserialize an artifact into a callable
    ``f(frame, case_params, mask)`` — no model code needed."""
    exp = jax_export.deserialize(Path(path).read_bytes())

    def call(*args):
        return exp.call(*args)

    return call

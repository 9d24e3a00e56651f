"""Mesh construction and sharding rules.

The reference implements no parallelism of any kind (SURVEY.md §2,
"Parallelism note"); this subsystem is TPU-greenfield. Strategy:

- 2-D logical mesh ``(data, model)``. Batches are sharded over ``data``
  (pure DP); selected large weight matrices can be sharded over
  ``model`` (TP) — XLA inserts the all-reduces/all-gathers over ICI.
- Everything flows through ``jit`` with ``NamedSharding`` annotations;
  no hand-written collectives on the training path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    spec: str = "auto",
    devices: Optional[Sequence] = None,
    tune_spectral: bool = True,
) -> Mesh:
    """Build a ``(data, model)`` mesh.

    spec: ``"auto"`` (all devices on data), ``"N"`` (N-way data), or
    ``"NxM"`` (N-way data × M-way model).

    ``tune_spectral``: publish the data-axis size to the spectral
    "auto" backend heuristic (a process-wide setting — the last mesh
    built with ``tune_spectral=True`` wins). Pass ``False`` for
    throwaway/diagnostic meshes so they don't perturb backend
    selection for the primary mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if spec == "auto":
        d, m = n, 1
    elif "x" in spec:
        d, m = (int(s) for s in spec.split("x"))
    else:
        d, m = int(spec), 1
    assert d * m <= n, f"mesh {d}x{m} needs {d * m} devices, have {n}"
    arr = np.array(devices[: d * m]).reshape(d, m)
    mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    if tune_spectral:
        # The spectral "auto" backend's rsep/wfirst crossover is a
        # per-chip batch threshold; tell it the data-axis size so a
        # global-batch shape traced under this mesh is judged per
        # shard. Single-device trace entry points (serving export,
        # meshless eval) declare set_data_shards(1) themselves so a
        # dp>1 mesh left behind here can't skew their backend choice
        # (ADVICE r4 #1).
        from ..ops import spectral

        spectral.set_data_shards(d)
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def default_sharding_fn(mesh, spatial: bool = False):
    """Per-batch placement hook for
    ``data.pipeline.device_prefetch``: ``None`` (default device) when
    there is no mesh, else data-axis batch sharding — optionally the
    spatial (data × model grid-row) variant."""
    if mesh is None:
        return None
    if spatial:
        return lambda b: batch_sharding_spatial(mesh, b)
    return lambda b: batch_sharding(mesh)


def shard_batch_spec(mesh: Mesh, batch: dict) -> dict:
    """Per-leaf NamedSharding pytree for a batch dict (all leaves have
    batch as the leading axis)."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda _: s, batch)


def batch_sharding_spatial(mesh: Mesh, batch: dict) -> dict:
    """Spatial (sp) sharding: field tensors (B, H, W, C) are split over
    (data, model) — batch over the data axis AND grid rows over the
    model axis. XLA's SPMD partitioner inserts the halo exchanges for
    convolutions and the reductions for row-contracting einsums (the
    FNO DFT projection), so models run unchanged. Pays off when the
    grid no longer fits one chip's HBM (the reference's raw data is
    ~remeshable to arbitrary resolution; the benchmark's 64×64 fits
    everywhere, so this is a scaling capability, not a default)."""

    def leaf(x):
        if getattr(x, "ndim", 0) == 4:
            return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
        return NamedSharding(mesh, P(DATA_AXIS))

    return jax.tree.map(leaf, batch)

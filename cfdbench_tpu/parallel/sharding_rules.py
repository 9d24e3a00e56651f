"""Parameter sharding rules (tensor parallelism over the model axis).

Megatron-style default for this model zoo: weight matrices large enough
to be worth splitting are sharded along their output-feature axis over
``MODEL_AXIS``; everything else (biases, norms, small kernels) is
replicated. XLA inserts the all-gathers/reduce-scatters over ICI — no
hand-written collectives.

For FNO specifically this splits each spectral-conv weight tensor
``(2, 2, Cin, Cout, m1, m2)`` and each 1×1-conv Dense kernel along the
output-channel axis, so the per-mode channel-mixing matmuls and channel
projections run column-parallel.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def _spec_for(x, model_size: int, min_size: int) -> P:
    if x.ndim < 2 or x.size < min_size:
        return P()
    # Spectral weights: (2, 2, Cin, Cout, m1, m2) → shard Cout (axis 3).
    if x.ndim == 6 and x.shape[0] == 2 and x.shape[1] == 2:
        if x.shape[3] % model_size == 0:
            spec = [None] * x.ndim
            spec[3] = MODEL_AXIS
            return P(*spec)
        return P()
    # Dense kernels (in, out) / conv kernels (kh, kw, in, out):
    # shard the trailing (output-feature) axis.
    if x.shape[-1] % model_size == 0:
        spec = [None] * (x.ndim - 1) + [MODEL_AXIS]
        return P(*spec)
    return P()


def param_shardings(params, mesh: Mesh, min_size: int = 4096):
    """Pytree of NamedShardings for a params tree."""
    m = mesh.shape[MODEL_AXIS]

    def leaf(x):
        return NamedSharding(
            mesh, _spec_for(x, m, min_size) if m > 1 else P()
        )

    return jax.tree.map(leaf, params)


def shard_params(params, mesh: Mesh, min_size: int = 4096):
    return jax.device_put(params, param_shardings(params, mesh, min_size))

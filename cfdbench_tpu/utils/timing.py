"""Timing helpers that are honest on every backend.

``jax.block_until_ready`` does not actually block on the tunneled axon
TPU backend used in this environment, so wall-clock timing around it
silently measures dispatch, not compute (the reference's
``measure_time`` harness, ``src/train.py:94-100``, has the same class of
problem on CUDA without a synchronize). The portable way to wait for a
computation is to force a device→host transfer of (a reduction of) its
output — the transfer cannot complete before the producing program has.
"""

from __future__ import annotations

import jax
import numpy as np


def force_completion(tree) -> None:
    """Block until ``tree``'s computation has finished on device.

    Transfers a scalar reduction of one array leaf to the host. All
    outputs of a single XLA executable complete together, so one leaf
    suffices per computation; callers timing multiple independent
    computations should pass (a leaf of) each.
    """
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "sum"):
            np.asarray(leaf.sum())
            return

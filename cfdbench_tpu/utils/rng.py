"""Training-stochasticity PRNG.

``fast_train_key`` returns an RBG-implementation key (XLA's
``RngBitGenerator`` — hardware-accelerated on TPU) instead of the
default threefry. Profiling the GenCast train step (xprof, v5e) showed
threefry dropout-mask generation fused into the conv kernels costing
~23 % of the whole step (33.0 → 25.5 ms/step after the switch;
BASELINE.md §gencast-anatomy). Training randomness carries no
bitwise-parity contract with the reference (SURVEY.md §7 hard-part e:
distributional parity) — eval paths that pin RNG values keep passing
explicit threefry keys.
"""

from __future__ import annotations

import jax


def fast_train_key(seed: int):
    try:
        return jax.random.key(seed, impl="rbg")
    except Exception:  # pragma: no cover — very old jax
        return jax.random.PRNGKey(seed)

"""Prefetching file IO for the data layer.

``prefetch_npy(paths)`` bulk-reads .npy files through the native C++
thread pool (``cfdbench_tpu.native``) into an in-memory cache;
``load_npy(path)`` then serves each file from the cache (consuming the
entry — one use per prefetch, so memory is handed over, not
duplicated) or falls back to ``np.load``. Loading a split becomes one
parallel native batch instead of the reference's serial
``np.load``-per-file Python loop (``src/dataset/cavity.py:15-34``).

Always correct without the native library: prefetch degrades to a
no-op and ``load_npy`` == ``np.load`` (float32-cast, like every loader
here). Equality with np.load is unit-tested (tests/test_native.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Sequence

import numpy as np

from .. import native

_CACHE: Dict[str, np.ndarray] = {}


def prefetch_npy(paths: Sequence, n_threads: int = 16) -> int:
    """Bulk-read ``paths`` into the cache; returns how many were
    prefetched (0 when the native library is unavailable)."""
    todo = [str(p) for p in paths if Path(p).exists()]
    todo = [p for p in todo if p not in _CACHE]
    if not todo or not native.available():
        return 0
    try:
        arrays = native.read_npy_f32_batch(todo, n_threads=n_threads)
    except ValueError:
        # Unsupported dtype/format somewhere in the batch: fall back to
        # np.load for everything (correctness over speed).
        return 0
    for p, a in zip(todo, arrays):
        _CACHE[p] = a
    return len(todo)


def prefetch_case_uv(case_dirs: Sequence) -> int:
    """Prefetch every case's u.npy / v.npy in one parallel batch."""
    paths = []
    for d in case_dirs:
        d = Path(d)
        paths += [d / "u.npy", d / "v.npy"]
    return prefetch_npy(paths)


def load_npy(path) -> np.ndarray:
    """Cache-consuming np.load replacement (float32)."""
    arr = _CACHE.pop(str(path), None)
    if arr is not None:
        return arr
    return np.load(path).astype(np.float32, copy=False)


def clear_cache() -> None:
    _CACHE.clear()

"""Host-side batch pipeline.

The reference feeds batches through a torch ``DataLoader`` whose
``collate_fn`` calls ``.cuda()`` per batch (``src/train_auto.py:33-58``).
The TPU-native replacement: datasets are packed host numpy arrays; each
epoch is a shuffled index permutation sliced into *statically shaped*
batches (the final partial batch is padded and carries 0/1 sample
weights so jitted steps see one shape and metrics stay exact — see
``cfdbench_tpu.metrics``). Device placement is eager and ahead of
consumption: ``device_prefetch`` keeps a small queue of batches whose
``jax.device_put`` transfers run while the previous step computes.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


def _pad_to(arr: np.ndarray, n: int) -> np.ndarray:
    if arr.shape[0] == n:
        return arr
    pad = np.zeros((n - arr.shape[0],) + arr.shape[1:], dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def batches(
    arrays: Dict[str, np.ndarray],
    batch_size: int,
    shuffle: bool,
    rng: Optional[np.random.Generator] = None,
    pad_multiple: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield dicts of batched arrays + a ``weights`` (0/1) array.

    ``pad_multiple`` additionally rounds the padded batch up so that it
    is divisible by the data-parallel axis size.
    """
    n = next(iter(arrays.values())).shape[0]
    for a in arrays.values():
        assert a.shape[0] == n
    idx = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    target = batch_size
    if target % pad_multiple:
        target += pad_multiple - target % pad_multiple
    for start in range(0, n, batch_size):
        take = idx[start: start + batch_size]
        batch = {k: _pad_to(a[take], target) for k, a in arrays.items()}
        w = np.zeros((target,), dtype=np.float32)
        w[: take.size] = 1.0
        batch["weights"] = w
        yield batch


def num_batches(n: int, batch_size: int) -> int:
    return -(-n // batch_size)


def device_prefetch(batch_iter, size: int = 2, sharding_fn=None):
    """Asynchronous double-buffered device feed.

    Wraps a host-batch iterator so that while the step consuming batch
    N runs, batches N+1 … N+(size-1) are already being transferred to
    device (``size`` counts every transferred-but-unconsumed batch
    *including* the one just yielded, so ``size=2`` is classic double
    buffering with one batch in flight; ``size=1`` only issues each
    async ``device_put`` immediately before yielding it).
    ``jax.device_put`` is asynchronous, so issuing it ahead of
    consumption overlaps host→device DMA with compute. The reference's
    ``DataLoader(num_workers=4)`` + per-batch ``.cuda()`` covers the
    host side but still transfers synchronously on use
    (``src/train_auto.py:33-58``).

    ``sharding_fn(batch) -> sharding-pytree`` computes the placement per
    batch (e.g. ``batch_sharding_spatial`` needs shapes); None places on
    the default device. Order is preserved exactly.
    """
    import jax
    from collections import deque

    q = deque()
    for b in batch_iter:
        if sharding_fn is not None:
            b = jax.device_put(b, sharding_fn(b))
        else:
            b = jax.device_put(b)
        q.append(b)
        # >= keeps at most ``size`` transferred-but-unconsumed batches
        # resident (the documented depth); > would silently hold
        # size+1, an extra batch of HBM at large shapes.
        if len(q) >= size:
            yield q.popleft()
    while q:
        yield q.popleft()

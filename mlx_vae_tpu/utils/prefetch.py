"""Host->device input pipeline.

The reference materializes each batch synchronously inside the train loop
(``/root/reference/mlx_data/dataloader.py:86-111`` + ``mx.eval`` per batch).
Here a small look-ahead queue issues ``jax.device_put`` (optionally with a
mesh data-sharding) for the next batches while the current step computes —
transfers ride the async dispatch stream and overlap compute.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Optional

import jax


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding: Optional[object] = None) -> Iterator:
    """Yield items from ``iterator`` device_put ahead by ``size`` steps.

    Items may be arrays or tuples/lists of arrays.
    """
    queue = collections.deque()
    it = iter(iterator)

    def put(item):
        if isinstance(item, (tuple, list)):
            return type(item)(jax.device_put(x, sharding) for x in item)
        return jax.device_put(item, sharding)

    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass

    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out

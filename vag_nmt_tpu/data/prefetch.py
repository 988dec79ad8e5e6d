"""Host->device double buffering (SURVEY.md C3).

`jax.device_put` is async: by putting the NEXT batch on device while the
current step computes, the HBM transfer hides behind compute. With a sharding,
this also splits the global batch over the 'data' mesh axis on the host side."""

from __future__ import annotations

from collections import deque
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np


def device_prefetch(
    it: Iterator[Dict[str, np.ndarray]],
    size: int = 2,
    sharding: Optional[Any] = None,
) -> Iterator[Dict[str, Any]]:
    queue: deque = deque()

    def put(batch):
        # ONE device_put for the whole pytree: each separate call pays fixed
        # host-side dispatch overhead (~0.1 ms measured), so per-key puts
        # cost ~1 ms/batch at 9 keys. `sharding` may be a callable
        # batch -> sharding for iterators that mix batch kinds (e.g. K-step
        # stacks and single batches in the train loop).
        s = sharding(batch) if callable(sharding) else sharding
        if s is not None:
            return jax.device_put(batch, s)
        return jax.device_put(batch)

    for batch in it:
        queue.append(put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()

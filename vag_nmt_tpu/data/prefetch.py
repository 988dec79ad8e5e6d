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
        if sharding is not None:
            return {k: jax.device_put(v, sharding) for k, v in batch.items()}
        return {k: jax.device_put(v) for k, v in batch.items()}

    for batch in it:
        queue.append(put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()

"""Input pipeline: background prefetch + host->device overlap.

The reference feeds the GPU synchronously from torch DataLoaders (workers=0
in the bench scripts).  On TPU the jitted step is asynchronous, so the win
is keeping the HOST side ahead: a background thread materializes upcoming
batches (parsing/synthesis/cache-tier lookups) and optionally device_puts
them while the current step runs.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


class PrefetchIterator:
    """Wrap a batch iterable with an N-deep background prefetch thread."""

    _SENTINEL = object()

    def __init__(self, it: Iterable, depth: int = 2,
                 to_device: bool = True, transform: Optional[Callable] = None):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._transform = transform
        self._to_device = to_device
        self._err = None
        self._thread = threading.Thread(target=self._fill, args=(iter(it),),
                                        daemon=True)
        self._thread.start()

    def _fill(self, it):
        try:
            for batch in it:
                if self._transform is not None:
                    batch = self._transform(batch)
                if self._to_device:
                    # a bare ndarray batch (e.g. packed criteo records)
                    # ships as ONE buffer; tuple batches ship per-element
                    if isinstance(batch, (tuple, list)):
                        batch = tuple(jnp.asarray(a) for a in batch)
                    else:
                        batch = jnp.asarray(batch)
                self._q.put(batch)
        except BaseException as e:   # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(batches: Iterable, depth: int = 2, to_device: bool = True,
             transform: Optional[Callable] = None) -> PrefetchIterator:
    """`for dense, idx, y in prefetch(ds.batches(...)):` — batches arrive
    already on device, produced while the previous step runs."""
    return PrefetchIterator(batches, depth, to_device, transform)

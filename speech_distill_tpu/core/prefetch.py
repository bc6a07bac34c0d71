"""Host-side batch prefetching: overlap collation/H2D with device compute.

The reference overlaps data work with GPU compute via DataLoader worker
processes + prefetch_factor (train.py:348-353). The TPU equivalent: a
background thread produces collated host batches and eagerly device_puts
them (sharded) while the current step runs — jax's async dispatch then
overlaps the transfer with compute. Bounded queue => bounded host memory.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

_SENTINEL = object()


class Prefetcher:
    """Wrap a host batch iterator; optionally apply ``put`` (device_put /
    shard) in the background thread so transfers start early."""

    def __init__(self, it: Iterator, put: Optional[Callable] = None,
                 depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._put = put
        self._err: Optional[BaseException] = None

        def worker():
            try:
                for item in it:
                    self._q.put(self._put(item) if self._put else item)
            except BaseException as e:  # surfaced on next __next__
                self._err = e
            finally:
                self._q.put(_SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(it: Iterator, put: Optional[Callable] = None,
             depth: int = 2) -> Iterator:
    return Prefetcher(it, put, depth)

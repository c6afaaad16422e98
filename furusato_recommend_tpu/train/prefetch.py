"""Host -> device prefetch pipeline.

The reference's producer/consumer prototype (`/root/reference/producer_consumer.py:9-124`,
`/root/reference/model/old/fastsage_pro.py:198-280`) overlapped CPU sample
generation with training via JoinableQueue worker processes. On TPU the
steady-state sampler already runs on device, so the remaining host-feed cases
are out-of-core features (the `dask` variant, SURVEY.md §2.3) and externally
produced batches. This module provides the idiomatic double-buffered
replacement: a background thread drains a host iterator and keeps ``size``
batches resident on device, so `device_put` overlaps with the current step.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax

__all__ = ["prefetch_to_device", "BackgroundProducer"]


def prefetch_to_device(iterator: Iterable, size: int = 2, device=None) -> Iterator:
    """Yield items from ``iterator`` with up to ``size`` already device_put."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(jax.device_put(item, device))
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


class BackgroundProducer:
    """Single-producer ring buffer (SURVEY.md §5.2 rebuild note): a host
    function produces batches on a thread; ``get()`` blocks for the next one.
    Structured replacement for the reference's multi-process JoinableQueue."""

    def __init__(self, produce_fn, num_batches: Optional[int] = None, size: int = 2, device=None):
        self._q: "queue.Queue" = queue.Queue(maxsize=size)
        self._stop = threading.Event()
        self._sentinel = object()

        def run():
            i = 0
            try:
                while not self._stop.is_set() and (num_batches is None or i < num_batches):
                    self._q.put(jax.device_put(produce_fn(i), device))
                    i += 1
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def get(self):
        item = self._q.get()
        if item is self._sentinel:
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        while True:  # drain so the producer unblocks
            try:
                if self._q.get_nowait() is self._sentinel:
                    break
            except queue.Empty:
                break
        self._thread.join(timeout=5)

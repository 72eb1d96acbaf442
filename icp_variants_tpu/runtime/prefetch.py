"""Background batch prefetcher — overlap host-side loading with device work.

The reference loads each ETH pair synchronously inside its sweep loop
(main.cpp:411-439, through PCL); here the NEXT batch's file parsing +
normal estimation runs on a worker thread while the CURRENT batch's ICP
program executes on the TPU. Parsing happens in the native thread pool
(runtime/native.parse_floats_f32_batch), which releases the GIL, so the
worker genuinely overlaps Python-side driver work too.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class Prefetcher(Iterator[T]):
    """Iterate ``fn(item)`` for each work item, computing ``depth`` results
    ahead on a daemon worker thread.

    Exceptions raised by ``fn`` re-raise at the corresponding ``__next__``
    (fault containment stays with the consumer, matching the sweep runner's
    per-batch error handling).
    """

    def __init__(
        self,
        items: Iterable,
        fn: Callable[..., T],
        depth: int = 1,
    ):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._items = list(items)
        self._fn = fn
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for it in self._items:
                try:
                    self._q.put((self._fn(it), None))
                except Exception as e:  # noqa: BLE001 — re-raised in consumer
                    self._q.put((None, e))
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self):
        return self

    def __next__(self) -> T:
        got = self._q.get()
        if got is _SENTINEL:
            # Re-queue the sentinel: a second next() after exhaustion must
            # raise StopIteration again, not block on an empty queue.
            self._q.put(_SENTINEL)
            raise StopIteration
        value, err = got
        if err is not None:
            raise err
        return value

"""Background-thread prefetch for dataset iterators.

The reference example mains decode each image synchronously on the
tracking thread (canonical ``Examples/Monocular/mono_tum.cc`` loop); with
the device pipeline asynchronous, a synchronous cv2 decode becomes the
per-frame critical path. This wraps any iterator with a small
producer-consumer queue so decode overlaps device work — the host-side
analog of double buffering (SURVEY.md §2.1 dataset-driver row:
"prefetching loaders").

Host-only: no jax imports, safe in any process.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_END = object()


class Prefetcher:
    """Iterate ``src`` on a daemon thread, ``depth`` items ahead.

    Exceptions in the producer re-raise in the consumer at the point of
    iteration. The thread exits with the iterator (or when the consumer
    drops the Prefetcher and the queue drains).
    """

    def __init__(self, src: Iterable[T], depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._err: BaseException | None = None

        def run():
            try:
                for item in src:
                    self._q.put(item)
            except BaseException as e:   # noqa: BLE001 — re-raised in consumer
                self._err = e
            finally:
                self._q.put(_END)

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def __iter__(self) -> Iterator[T]:
        return self

    def __next__(self) -> T:
        item = self._q.get()
        if item is _END:
            self._t.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(src: Iterable[T], depth: int = 4) -> Prefetcher:
    """Convenience wrapper: ``for ts, img in prefetch(tum.iter_mono(d)):``"""
    return Prefetcher(src, depth)

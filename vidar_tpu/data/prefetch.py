"""Threaded host-side prefetch loader.

The reference overlaps host data work with GPU compute via torch DataLoader
worker *processes* (datasets/builder.py:19-94). On TPU the equivalent is a
thread pool: the heavy numeric work (JPEG decode, point filtering,
voxelisation, normalise+pad) runs in ``vidar_tpu.native`` C++ calls that
release the GIL, so plain threads reach full host parallelism without the
serialization cost of worker processes, and the produced numpy batches are
handed to ``jax.device_put`` while the TPU executes the previous step.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


class PrefetchLoader:
    """Wrap a sample-producing callable over an index iterable.

    ``fetch(i)`` is executed by ``num_threads`` workers; results are yielded
    in order. ``depth`` bounds the number of in-flight samples (memory).
    """

    def __init__(self, fetch: Callable[[int], object],
                 indices: Iterable[int], num_threads: int = 4,
                 depth: int = 8):
        self._fetch = fetch
        self._indices = list(indices)
        self._num_threads = max(1, num_threads)
        self._depth = max(1, depth)

    def __len__(self) -> int:
        return len(self._indices)

    def __iter__(self) -> Iterator[object]:
        todo = collections.deque(enumerate(self._indices))
        results = {}
        done = queue.Queue()
        lock = threading.Lock()
        stop = threading.Event()
        inflight = threading.Semaphore(self._depth)

        def worker():
            while not stop.is_set():
                inflight.acquire()
                with lock:
                    if not todo:
                        inflight.release()
                        return
                    pos, idx = todo.popleft()
                try:
                    out = self._fetch(idx)
                    done.put((pos, out, None))
                except BaseException as e:  # surfaced to the consumer
                    done.put((pos, None, e))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self._num_threads)]
        for t in threads:
            t.start()
        try:
            next_pos = 0
            total = len(self._indices)
            while next_pos < total:
                while next_pos not in results:
                    pos, out, err = done.get()
                    if err is not None:
                        raise err
                    results[pos] = out
                yield results.pop(next_pos)
                inflight.release()
                next_pos += 1
        finally:
            stop.set()
            # drain permits so blocked workers can exit
            for _ in threads:
                inflight.release()
            for t in threads:
                t.join(timeout=1.0)

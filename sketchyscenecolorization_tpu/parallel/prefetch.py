"""Host→device input prefetching.

Replaces the reference's TF1 queue runners (4 reader threads feeding
``shuffle_batch`` — ``obj_lib/input_pipeline.py:131-154``,
``main_procedure.py:109-122,173-174``) and its per-step host-side PIL/scipy
loading inside the hot loop (``matching_main.py:179-214``,
``bg_colorization_main.py:918-941``): a background thread pool prepares
NumPy batches while ``prefetch_to_device`` keeps ``depth`` batches already
transferred, so the device never waits on host IO.
"""
from __future__ import annotations

import collections
import queue
import threading
from typing import Any, Callable, Iterable, Iterator

import jax

from .mesh import shard_batch


def prefetch_to_device(iterator: Iterable[Any], depth: int = 2,
                       mesh=None) -> Iterator[Any]:
    """Yield batches with ``depth`` transfers in flight.

    ``jax.device_put`` is async; keeping a small deque of already-transferred
    batches double-buffers the host→HBM copy against the running step.
    When ``mesh`` is given, batches are sharded over its 'data' axis.
    """
    buf = collections.deque()

    def put(batch):
        if mesh is not None:
            return shard_batch(batch, mesh)
        return jax.tree_util.tree_map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out


class BackgroundGenerator:
    """Run a (possibly IO-bound) batch generator on worker threads.

    The TPU-native stand-in for TF1 queue runners: ``num_workers`` threads
    call ``make_batch(step)`` and push results into a bounded queue; the
    training loop pops ready batches.  Order across workers is not
    guaranteed (neither was TF's shuffle_batch)."""

    def __init__(self, make_batch: Callable[[int], Any], num_steps: int,
                 num_workers: int = 4, max_queue: int = 8):
        self._q: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._lock = threading.Lock()
        self._next = 0
        self._num_steps = num_steps
        self._make = make_batch
        self._stop = threading.Event()
        self._threads = [threading.Thread(target=self._worker, daemon=True)
                         for _ in range(num_workers)]
        for t in self._threads:
            t.start()

    def _worker(self):
        while not self._stop.is_set():
            with self._lock:
                if self._next >= self._num_steps:
                    return
                step = self._next
                self._next += 1
            try:
                item = self._make(step)
            except BaseException as e:  # surface worker failures to the consumer
                item = e
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def close(self):
        """Release worker threads and queued batches (call when abandoning
        the iterator early, e.g. a NaN abort mid-training)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self):
        for _ in range(self._num_steps):
            item = self._q.get()
            if isinstance(item, BaseException):
                raise item
            yield item

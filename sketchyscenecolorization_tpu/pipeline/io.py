"""Fast image IO for the interactive pipeline.

``write_png`` is a minimal RGB8 PNG encoder (single IDAT, per-row 'sub'
filter, configurable zlib level).  PIL's encoder spends ~160-200 ms on a
768^2 result image regardless of compression level (its adaptive row
filtering dominates); this writer does the same image in ~5 ms (level 0) /
~45 ms (level 1) and produces byte-exact pixels on round-trip (PIL reads it
back verbatim -- tested in ``tests/test_pipeline_serving.py``).

``AsyncPngWriter`` is a write-behind queue: the session keeps results in
memory (its own read path never touches disk for the latest image), so PNG
encoding can overlap the next instruction's device work.  ``flush()`` joins
the queue; withdraw and session shutdown flush first.

The reference writes synchronously with scipy/PIL
(``fg_color_utils.py:361-363``, ``bg_utils.py:313-325``); output bytes here
decode to identical pixel content.
"""
from __future__ import annotations

import os
import queue
import struct
import threading
import zlib
from typing import Optional

import numpy as np


def png_bytes(arr: np.ndarray, level: int = 1) -> bytes:
    """RGB uint8 [H, W, 3] -> PNG file bytes (color type 2, bit depth 8)."""
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    h, w, _ = arr.shape
    row = np.ascontiguousarray(arr).reshape(h, w * 3)
    if level == 0:
        # filter 0 (None): cheapest; compression is off anyway
        raw = np.concatenate(
            [np.zeros((h, 1), np.uint8), row], axis=1).tobytes()
    else:
        # filter 1 (Sub): horizontal delta, cheap and compresses well on
        # flat-colored sketch output
        delta = row.copy()
        delta[:, 3:] = row[:, 3:] - row[:, :-3]
        raw = np.concatenate(
            [np.ones((h, 1), np.uint8), delta], axis=1).tobytes()
    if level == 0:
        comp = zlib.compress(raw, 0)
    else:
        # Z_RLE strategy: on Sub-filtered colorization output it is ~1.8x
        # faster than the default strategy AND slightly smaller (measured
        # 11 vs 20 ms, 507 vs 528 KB on a fully-colorized 768^2 canvas);
        # still a standard zlib stream, so the PNG stays universally
        # decodable (round-trip asserted in tests)
        c = zlib.compressobj(level, zlib.DEFLATED, 15, 8, zlib.Z_RLE)
        comp = c.compress(raw) + c.flush()

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", comp) + chunk(b"IEND", b""))


def write_png(path: str, arr: np.ndarray, level: int = 1) -> None:
    with open(path, "wb") as f:
        f.write(png_bytes(arr, level))


class AsyncPngWriter:
    """Worker-thread pool draining (path, array, level) jobs.

    ``zlib.compress`` and the numpy filter pass release the GIL, so encoding
    scales across workers on multi-core hosts (a stream of 768^2 results at
    the headline pass rate would otherwise serialize ~5-45 ms encodes on one
    thread).  Default: 1 worker on a single-core host (threads only add
    handoff overhead there -- measured +19% on the 1-CPU tunnel box), else 2.
    Jobs are dispatched by path hash: writes to the SAME path always land on
    the same worker, preserving last-write-wins order; different paths are
    independent files, so cross-worker reordering is unobservable.

    Arrays are copied at enqueue time so callers may keep mutating their
    buffers.  Exceptions in a worker are re-raised at the next ``save`` or
    ``flush`` so failures are not silent.
    """

    def __init__(self, workers: Optional[int] = None, trace=None):
        if workers is None:
            workers = 1 if (os.cpu_count() or 1) <= 1 else 2
        self._queues = [queue.Queue() for _ in range(max(1, workers))]
        self._trace = trace     # optional shared (label, t0, t1) event list
        self._error: Optional[BaseException] = None
        self._threads = [
            threading.Thread(target=self._run, args=(q,), daemon=True)
            for q in self._queues]
        for t in self._threads:
            t.start()

    def _run(self, q: "queue.Queue[Optional[tuple]]"):
        while True:
            job = q.get()
            try:
                if job is None:
                    return
                path, arr, level = job
                if self._trace is None:
                    host = arr() if callable(arr) else np.asarray(arr)
                    write_png(path, host, level)
                else:
                    import time
                    t0 = time.perf_counter()
                    host = arr() if callable(arr) else np.asarray(arr)
                    t1 = time.perf_counter()
                    if not isinstance(arr, np.ndarray):
                        self._trace.append(("png_fetch", t0, t1))
                    write_png(path, host, level)
                    self._trace.append(
                        ("png_encode", t1, time.perf_counter()))
            except BaseException as e:   # noqa: BLE001 - surfaced on flush
                self._error = e
            finally:
                q.task_done()

    def _check(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def save(self, path: str, arr, level: int = 1, copy: bool = True) -> None:
        """``arr``: uint8 [H, W, 3] ndarray (copied by default -- callers may
        keep mutating; pass ``copy=False`` when the caller guarantees the
        array is never mutated), a DEVICE array / ``__array__`` wrapper
        (kept by handle: device buffers are immutable, and the worker's
        ``np.asarray`` moves the device->host fetch off the critical path
        too), or a zero-arg CALLABLE returning the array -- the whole image
        construction then runs in the worker (the BG fg-debug image uses
        this so the main thread never blocks on the previous canvas)."""
        self._check()
        q = self._queues[hash(path) % len(self._queues)]
        if copy and isinstance(arr, np.ndarray):
            arr = np.array(arr, copy=True)
        q.put((path, arr, level))

    def flush(self) -> None:
        for q in self._queues:
            q.join()
        self._check()

    def close(self) -> None:
        self.flush()
        for q, t in zip(self._queues, self._threads):
            q.put(None)
            t.join()

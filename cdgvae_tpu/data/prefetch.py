"""Host→device prefetch pipeline.

The pendulum/tabular datasets are device-resident (MBs), but the real
CelebAMask-HQ corpus at 128px×8ch is ~16 GB — larger than one chip's HBM —
so its batches must stream from host. This double-buffered prefetcher
overlaps the host gather + H2D transfer of the next batch with the device
compute of the current one (the reference blocks on `.cuda()` per batch,
modules/train.py:163-165; SURVEY.md §7 'host→device prefetch pipelines').
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import numpy as np
import jax


def batched_indices(n: int, batch_size: int, rng: np.random.Generator,
                    drop_remainder: bool = True) -> Iterator[np.ndarray]:
    perm = rng.permutation(n)
    end = n - (n % batch_size) if drop_remainder else n
    for i in range(0, end, batch_size):
        yield perm[i: i + batch_size]


def prefetch_batches(arrays: Sequence[np.ndarray], batch_size: int,
                     rng: np.random.Generator, prefetch: int = 2,
                     drop_remainder: bool = True,
                     sharding=None) -> Iterator[tuple]:
    """Yield device-resident batch tuples, gathering + transferring up to
    ``prefetch`` batches ahead on a background thread.

    arrays: host numpy arrays sharing the leading dimension (x, y, ...).
    sharding: optional jax sharding for the device placement (e.g. the dp
    batch sharding); None = default device.
    """
    n = len(arrays[0])
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def _put(item):
        # never block forever: an abandoned consumer (break out of the
        # loop) may leave the queue full — poll the stop flag instead of
        # deadlocking the producer thread on a full queue
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for idx in batched_indices(n, batch_size, rng, drop_remainder):
                if stop.is_set():
                    return
                batch = tuple(
                    jax.device_put(a[idx], sharding) for a in arrays)
                if not _put(("batch", batch)):
                    return
        except BaseException as e:  # propagate to the consumer
            _put(("error", e))
        else:
            _put(("end", None))

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            kind, payload = q.get()
            if kind == "end":
                return
            if kind == "error":
                raise payload
            yield payload
    finally:
        stop.set()
        # drain so the producer can exit
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break

"""Streaming host pipeline feeding HBM (BASELINE.json:5).

Two paths, both fixed-shape:

* ``DeviceDataset`` — the whole padded window set is resident in HBM (ETH/UCY
  is tiny: a few thousand windows x n_max x 20 x 2 floats) and every batch is
  an on-device gather by a host-sampled index vector.  This is the fast path
  the trainer uses by default: zero host->device traffic per step beyond the
  index vector.

* ``prefetch_to_device`` — a classic double-buffered host->HBM prefetcher for
  datasets that don't fit (or for true streaming ingest).  Keeps one batch in
  flight while the step function consumes the previous one.
"""

from __future__ import annotations

import collections
import threading
from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmtraj.data.collate import WindowDataset


class DeviceDataset:
    """HBM-resident padded windows with on-device batch gather."""

    def __init__(self, ds: WindowDataset, sharding=None):
        self.xy = jax.device_put(jnp.asarray(ds.xy), None)
        self.mask = jax.device_put(jnp.asarray(ds.mask), None)
        self.n_windows = ds.n_windows
        self._gather = jax.jit(
            lambda xy, mask, idx: (xy[idx], mask[idx]),
            out_shardings=sharding,
        )

    def batch(self, idx: np.ndarray) -> Tuple[jax.Array, jax.Array]:
        return self._gather(self.xy, self.mask, jnp.asarray(idx))

    def epoch_indices(self, batch_size: int, rng: np.random.Generator) -> Iterator[np.ndarray]:
        perm = rng.permutation(self.n_windows)
        if len(perm) == 0:
            return
        pad = (-len(perm)) % batch_size
        if pad:
            # np.resize repeats cyclically, so batch_size > n_windows still
            # yields a full fixed-shape batch (no recompiles).
            perm = np.concatenate([perm, np.resize(perm, pad)])
        for s in range(0, len(perm), batch_size):
            yield perm[s : s + batch_size]


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Double-buffered host->device prefetch.

    Wraps an iterator of pytrees of numpy arrays; yields device arrays while
    the next transfer is already in flight (SURVEY.md §1 L1: "streaming host
    pipeline feeding HBM").  A background thread overlaps host work (batch
    assembly) with device compute; jax transfers are async already, so the
    queue depth bounds in-flight HBM.
    """
    queue: collections.deque = collections.deque()
    done = object()
    lock = threading.Semaphore(0)
    space = threading.Semaphore(size)
    stop = threading.Event()

    def producer():
        try:
            for item in iterator:
                # Poll the slot semaphore so an abandoned consumer (e.g. the
                # trainer breaking out mid-epoch at the step budget) releases
                # this thread and its queued device buffers instead of leaking
                # them for the process lifetime.
                while not space.acquire(timeout=0.1):
                    if stop.is_set():
                        return
                if stop.is_set():
                    return
                queue.append(jax.device_put(item, sharding))
                lock.release()
            queue.append(done)
        except BaseException as e:  # noqa: BLE001 — re-raised by the consumer
            # Hand the failure to the consumer; a dead producer must not
            # leave the trainer blocked on lock.acquire() forever.
            queue.append(e)
        lock.release()

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            lock.acquire()
            item = queue.popleft()
            if item is done:
                return
            if isinstance(item, BaseException):
                raise item
            space.release()
            yield item
    finally:
        # Runs on normal exhaustion AND on generator close (consumer break).
        stop.set()
        queue.clear()  # drop device buffers promptly

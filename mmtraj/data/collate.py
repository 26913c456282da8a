"""Batching over variable agent counts: pad to fixed N_max with masks.

The reference batches Python lists over variable N (BASELINE.json:5 "Python
loops over variable agent counts"); the rebuild pads every window to a fixed
``(n_max, T, 2)`` tensor plus a ``(n_max,)`` validity mask so the whole dataset
lives in HBM as one fixed-shape array and every batch is a gather
(BASELINE.json:5 "padded/masked fixed-shape tensors"; :9 "masked variable agent
counts"; :10 "padded fixed-shape graphs").
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def pad_windows(
    windows: Sequence[np.ndarray], n_max: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """List of (N_i, T, 2) -> (xy (W, n_max, T, 2), mask (W, n_max), n_dropped).

    Windows with more than n_max agents keep the n_max agents closest to the
    crowd centroid at the first frame (a deterministic, position-aware rule —
    dropping arbitrary trailing ids would bias against late-entering peds) and
    the overflow count is returned so callers can warn.
    """
    if not windows:
        raise ValueError("no windows to pad")
    T = windows[0].shape[1]
    W = len(windows)
    xy = np.zeros((W, n_max, T, 2), dtype=np.float32)
    mask = np.zeros((W, n_max), dtype=bool)
    dropped = 0
    for w, traj in enumerate(windows):
        n = traj.shape[0]
        if n > n_max:
            centroid = traj[:, 0].mean(axis=0)
            order = np.argsort(((traj[:, 0] - centroid) ** 2).sum(axis=1))
            traj = traj[order[:n_max]]
            dropped += n - n_max
            n = n_max
        xy[w, :n] = traj
        mask[w, :n] = True
    return xy, mask, dropped


class WindowDataset:
    """Fixed-shape, fully materialized window set (fits in HBM for ETH/UCY).

    Exposes numpy arrays ``xy (W, n_max, T, 2)`` / ``mask (W, n_max)``; the
    streaming/prefetch path lives in mmtraj/data/pipeline.py.
    """

    def __init__(self, windows: List[np.ndarray], n_max: int):
        self.xy, self.mask, self.n_dropped = pad_windows(windows, n_max)
        self.n_windows = self.xy.shape[0]
        self.n_max = n_max
        self.seq_len = self.xy.shape[2]

    def __len__(self) -> int:
        return self.n_windows

    def batch(self, idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        return self.xy[idx], self.mask[idx]

    def epoch_batches(self, batch_size: int, rng: np.random.Generator):
        """Yield shuffled (xy, mask) batches; final partial batch is wrapped to
        keep every batch the same fixed shape (no recompiles)."""
        perm = rng.permutation(self.n_windows)
        if len(perm) == 0:
            return
        pad = (-len(perm)) % batch_size
        if pad:
            # np.resize repeats cyclically, so batch_size > n_windows still
            # yields full fixed-shape batches.
            perm = np.concatenate([perm, np.resize(perm, pad)])
        for s in range(0, len(perm), batch_size):
            yield self.batch(perm[s : s + batch_size])

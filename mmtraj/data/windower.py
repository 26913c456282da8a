"""Sequence windowing: slide obs+pred windows over a scene.

SURVEY.md §2.1 / BASELINE.json:7: obs=8 / pred=12 frame windows; a window's
agents are the pedestrians present for the full 20 frames, grouped co-present
into a per-window "scene" with variable agent count N (padded downstream,
mmtraj/data/collate.py).
"""

from __future__ import annotations

from typing import List

import numpy as np

from mmtraj.data.parser import scene_arrays


def make_windows(
    rows: np.ndarray,
    obs_len: int = 8,
    pred_len: int = 12,
    stride: int = 1,
    min_agents: int = 1,
) -> List[np.ndarray]:
    """Rows (R, 4) -> list of (N_i, obs+pred, 2) float32 trajectory windows.

    Windows slide over the scene's sorted unique frame index with the given
    stride; only pedestrians present at every one of the window's obs+pred
    frames are kept (full-presence rule, SURVEY.md §2.1).  Fully vectorized:
    one presence matrix cumulative-sum gives all windows' membership at once.
    """
    seq_len = obs_len + pred_len
    positions, presence, frames, _ = scene_arrays(rows)
    P, F = presence.shape
    if F < seq_len or P == 0:
        return []

    # present_all[p, s] == True iff ped p present at all frames s..s+seq_len-1.
    csum = np.concatenate(
        [np.zeros((P, 1), np.int64), np.cumsum(presence, axis=1, dtype=np.int64)], axis=1
    )
    window_counts = csum[:, seq_len:] - csum[:, :-seq_len]  # (P, F - seq_len + 1)
    present_all = window_counts == seq_len

    windows: List[np.ndarray] = []
    for s in range(0, F - seq_len + 1, stride):
        sel = present_all[:, s]
        n = int(sel.sum())
        if n < min_agents:
            continue
        windows.append(positions[sel, s : s + seq_len].copy())
    return windows

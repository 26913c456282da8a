"""ETH/UCY annotation-file parsing.

Format (SURVEY.md §2.1, the canonical public format of this repo family;
BASELINE.json:5 "Dataset loaders for ETH/UCY annotation files"): whitespace- or
tab-separated rows ``frame_id ped_id x y`` — world coordinates in meters, one
row per (frame, pedestrian), frames sampled every 0.4 s (every 10th video
frame).

The host-side parse is NumPy-vectorized; everything downstream is fixed-shape
device tensors (no Python loops over variable agent counts — the rebuild's
explicit mandate, BASELINE.json:5).
"""

from __future__ import annotations

import numpy as np


def read_annotation_file(path: str) -> np.ndarray:
    """Read one annotation txt file -> float64 array of shape (R, 4).

    Columns: frame_id, ped_id, x, y.  Tolerates tabs, repeated spaces, blank
    lines, and extra trailing columns (some public dumps carry more columns).
    """
    rows = np.loadtxt(path, dtype=np.float64, ndmin=2)
    if rows.size == 0:
        return np.zeros((0, 4), dtype=np.float64)
    if rows.shape[1] < 4:
        raise ValueError(f"{path}: expected >=4 columns (frame ped x y), got {rows.shape[1]}")
    return np.ascontiguousarray(rows[:, :4])


def scene_arrays(rows: np.ndarray):
    """Densify one scene's rows into fixed-shape per-ped arrays.

    Returns:
      positions: (P, F, 2) float32 — ped p's world XY at frame index f
                 (garbage where absent)
      presence:  (P, F) bool — ped p observed at frame index f
      frames:    (F,) float64 — sorted unique raw frame ids
      peds:      (P,) float64 — sorted unique raw ped ids

    This is the vectorized equivalent of the reference's group-by-frame /
    group-by-ped Python loops (SURVEY.md §3.3).
    """
    if rows.shape[0] == 0:
        return (
            np.zeros((0, 0, 2), np.float32),
            np.zeros((0, 0), bool),
            np.zeros((0,), np.float64),
            np.zeros((0,), np.float64),
        )
    frames, f_idx = np.unique(rows[:, 0], return_inverse=True)
    peds, p_idx = np.unique(rows[:, 1], return_inverse=True)
    P, F = len(peds), len(frames)
    positions = np.zeros((P, F, 2), dtype=np.float32)
    presence = np.zeros((P, F), dtype=bool)
    positions[p_idx, f_idx] = rows[:, 2:4].astype(np.float32)
    presence[p_idx, f_idx] = True
    return positions, presence, frames, peds

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

import re

import numpy as np

# Leading numeric prefix of a token, mirroring what strtod (and the native
# fast parser, mmtraj/native/fastparse.cpp) accepts before trailing junk.
_NUM = re.compile(r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")


def _read_tolerant(path: str) -> np.ndarray:
    """Line-by-line parse with EXACTLY the native parser's tolerance
    semantics (fastparse.cpp parse_buffer): blank lines and '#'/'%' comment
    lines skipped; numbers separated by whitespace or commas; parsing a line
    stops at the first non-numeric token; every data line must yield >= 4
    numbers (else ValueError naming the line); first 4 kept."""
    rows = []
    with open(path, "r") as f:
        for line_no, line in enumerate(f, 1):
            q = line.strip()
            if not q or q[0] in "#%":
                continue
            vals = []
            for tok in q.replace(",", " ").split():
                m = _NUM.match(tok)
                if m is None:
                    break
                vals.append(float(m.group()))
                if m.end() < len(tok):  # trailing junk glued to the number
                    break
            if len(vals) < 4:
                raise ValueError(
                    f"{path}: malformed line {line_no} (expected >=4 numeric columns)"
                )
            rows.append(vals[:4])
    if not rows:
        return np.zeros((0, 4), dtype=np.float64)
    return np.asarray(rows, dtype=np.float64)


def read_annotation_file(path: str) -> np.ndarray:
    """Read one annotation txt file -> float64 array of shape (R, 4).

    Columns: frame_id, ped_id, x, y.  Tolerates tabs, repeated spaces, blank
    lines, extra trailing columns (some public dumps carry more), '#'/'%'
    comments, comma separators, and trailing non-numeric junk — the same
    tolerance envelope as the native C++ parser, so the two are
    interchangeable on messy files too (pinned in tests/test_native.py).

    Fast path: np.loadtxt's C tokenizer for the canonical clean format;
    anything it rejects re-parses through the tolerant scanner.
    """
    try:
        rows = np.loadtxt(path, dtype=np.float64, ndmin=2)
    except ValueError:
        rows = _read_tolerant(path)
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

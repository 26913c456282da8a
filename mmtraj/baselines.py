"""Closed-form trajectory baselines: constant velocity (and zero velocity).

The classic sanity anchors for ETH/UCY evaluation.  Every published protocol
in this repo family reports a constant-velocity (CV) row — a learned model
that cannot beat CV on a scene is misconfigured, and the CV number also
calibrates how hard a *dataset* is (synthetic vs real ETH/UCY difficulty can
be compared through it even though the reference's own outputs are
unavailable, SURVEY.md §0).  Pure numpy — milliseconds on host, no device,
no RNG; K=1 (deterministic single-mode prediction, so best-of-K == the one
trajectory).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from mmtraj.data.collate import WindowDataset


def constant_velocity(xy_obs: np.ndarray, pred_len: int) -> np.ndarray:
    """(..., To, 2) absolute positions -> (..., Tp, 2) CV extrapolation.

    Extrapolates the last observed per-frame offset linearly — the standard
    CV baseline (one frame of velocity, not a window fit, matching common
    protocol implementations).
    """
    v = xy_obs[..., -1, :] - xy_obs[..., -2, :]  # (..., 2)
    steps = np.arange(1, pred_len + 1, dtype=xy_obs.dtype)
    return xy_obs[..., -1:, :] + steps[:, None] * v[..., None, :]


def zero_velocity(xy_obs: np.ndarray, pred_len: int) -> np.ndarray:
    """(..., To, 2) -> (..., Tp, 2): freeze at the last observed position.

    The weakest anchor — any model below ZV has learned nothing."""
    last = xy_obs[..., -1:, :]
    return np.broadcast_to(last, xy_obs.shape[:-2] + (pred_len, 2)).copy()


_BASELINES = {"cv": constant_velocity, "zv": zero_velocity}


def evaluate_baseline(
    test_ds: WindowDataset, obs_len: int, baseline: str = "cv"
) -> Dict[str, float]:
    """Masked ADE/FDE of a closed-form baseline over a WindowDataset.

    Same metric semantics as mmtraj.evaluate.evaluate (per-agent masked mean
    in world meters) so the row slots directly into the quality tables;
    reports k=1 and the baseline name.
    """
    try:
        fn = _BASELINES[baseline]
    except KeyError:
        raise ValueError(
            f"unknown baseline {baseline!r} (have {sorted(_BASELINES)})"
        ) from None
    xy, mask = test_ds.xy, test_ds.mask  # (W, N, T, 2), (W, N)
    obs, gt = xy[:, :, :obs_len], xy[:, :, obs_len:]
    pred = fn(obs, gt.shape[2])
    dist = np.linalg.norm(pred - gt, axis=-1)  # (W, N, Tp)
    m = mask.astype(np.float64)
    n_agents = max(m.sum(), 1.0)
    return {
        "min_ade": float((dist.mean(axis=-1) * m).sum() / n_agents),
        "min_fde": float((dist[..., -1] * m).sum() / n_agents),
        "k": 1,
        "baseline": baseline,
        "reduction": "per_agent",
        "n_windows": len(test_ds),
        "n_agents": int(n_agents),
        "n_dropped": int(test_ds.n_dropped),
    }

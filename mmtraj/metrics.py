"""ADE/FDE metrics with masking and best-of-K reduction.

BASELINE.json:2 — the quality metric is best-of-K (K=20) ADE/FDE in world
meters: per-agent ADE_k = mean_t ||pred - gt||_2 over the 12 prediction steps,
FDE_k at the final step; best-of-K takes min over the K samples *per agent*,
then the masked mean over agents (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def displacement_errors(
    pred: jnp.ndarray, gt: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pred/gt (..., Tp, 2) -> per-trajectory (ade (...), fde (...))."""
    dist = jnp.linalg.norm(pred - gt, axis=-1)  # (..., Tp)
    return dist.mean(axis=-1), dist[..., -1]


def ade_fde(
    pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked-mean ADE/FDE.  pred/gt (..., N, Tp, 2), mask (..., N) -> scalars."""
    ade, fde = displacement_errors(pred, gt)
    denom = jnp.maximum(mask.sum(), 1)
    return (
        jnp.where(mask, ade, 0.0).sum() / denom,
        jnp.where(mask, fde, 0.0).sum() / denom,
    )


def best_of_k(
    preds: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best-of-K ADE/FDE.  preds (K, ..., N, Tp, 2), gt (..., N, Tp, 2),
    mask (..., N) -> scalar (min-ADE, min-FDE), meters."""
    ade_k, fde_k = displacement_errors(preds, gt[None])  # (K, ..., N)
    ade = ade_k.min(axis=0)
    fde = fde_k.min(axis=0)
    denom = jnp.maximum(mask.sum(), 1)
    return (
        jnp.where(mask, ade, 0.0).sum() / denom,
        jnp.where(mask, fde, 0.0).sum() / denom,
    )

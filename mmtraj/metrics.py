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


def miss_rate(
    preds: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray, threshold: float = 2.0
) -> jnp.ndarray:
    """Best-of-K miss rate: fraction of valid agents whose BEST final-step
    displacement still exceeds `threshold` meters (the common MR-K@2m).
    preds (K, ..., N, Tp, 2), gt (..., N, Tp, 2), mask (..., N) -> scalar."""
    _, fde_k = displacement_errors(preds, gt[None])  # (K, ..., N)
    best_fde = fde_k.min(axis=0)
    denom = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask, best_fde > threshold, False).sum() / denom


def collisions(
    preds: jnp.ndarray, mask: jnp.ndarray, threshold: float = 0.2
) -> jnp.ndarray:
    """Per-(sample, window, agent) collision indicator: True where the agent
    passes within `threshold` meters of another agent's trajectory FROM THE
    SAME JOINT SAMPLE at any prediction step.  preds (K, B, N, Tp, 2),
    mask (B, N) -> bool (K, B, N).  Building block for collision_rate and
    the evaluator's per-window accumulation."""
    # Time axis BEFORE the (N, N) pair dims: the pairwise intermediates then
    # keep N (64) as the TPU lane dimension instead of Tp (12), which would
    # lane-pad 12 -> 128 (~10x wasted VPU work; same hazard documented in
    # mmtraj/ops/fused_gat.py for trailing head dims).
    xt = jnp.swapaxes(preds[..., 0], 2, 3)  # (K, B, Tp, N)
    yt = jnp.swapaxes(preds[..., 1], 2, 3)
    d2 = (
        (xt[..., :, None] - xt[..., None, :]) ** 2
        + (yt[..., :, None] - yt[..., None, :]) ** 2
    )  # (K, B, Tp, N, N)
    pair = (mask[:, :, None] & mask[:, None, :])[None, :, None]  # (1,B,1,N,N)
    n = mask.shape[-1]
    off_diag = ~jnp.eye(n, dtype=bool)
    hit = (d2 < threshold * threshold) & pair & off_diag  # (K, B, Tp, N, N)
    return hit.any(axis=(2, 4))  # (K, B, N): agent collides with anyone


def collision_rate(
    preds: jnp.ndarray, mask: jnp.ndarray, threshold: float = 0.2
) -> jnp.ndarray:
    """Fraction of sampled trajectories that collide with another agent's
    trajectory FROM THE SAME SAMPLE.  Social-plausibility diagnostic (the GAT
    exists to avoid exactly this).  preds (K, B, N, Tp, 2), mask (B, N)
    -> scalar in [0, 1]."""
    collided = collisions(preds, mask, threshold)
    denom = jnp.maximum(mask.sum() * preds.shape[0], 1)
    return jnp.where(mask[None], collided, False).sum() / denom

"""On-device social-graph construction.

BASELINE.json:5: the reference builds "per-frame social graphs (adjacency from
agent XY proximity)" in Python loops over variable agent counts; here the
adjacency is a single fused broadcast/compare over padded fixed-shape tensors,
recomputed every frame *inside* `lax.scan` bodies (including autoregressive
rollout, where it depends on sampled positions — SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_sq_dists(xy: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 2) positions -> (..., N, N) squared euclidean distances."""
    diff = xy[..., :, None, :] - xy[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def proximity_adjacency(
    xy: jnp.ndarray, mask: jnp.ndarray, radius: float
) -> jnp.ndarray:
    """Per-frame proximity graph over co-present (valid) agents.

    Args:
      xy:     (..., N, 2) absolute positions, meters.
      mask:   (..., N) bool validity (False = padding).
      radius: connect i<->j iff ||xy_i - xy_j|| <= radius; radius <= 0 means
              fully connected over valid agents (distance structure is then
              left to learned attention).

    Returns bool (..., N, N), symmetric, no self loops, False anywhere either
    endpoint is padding.  Self interaction is added separately by the GAT
    layer so that isolated-but-valid agents still attend to themselves.
    """
    valid = mask[..., :, None] & mask[..., None, :]
    n = xy.shape[-2]
    not_self = ~jnp.eye(n, dtype=bool)
    if radius <= 0:
        return valid & not_self
    d2 = pairwise_sq_dists(xy)
    return valid & not_self & (d2 <= radius * radius)

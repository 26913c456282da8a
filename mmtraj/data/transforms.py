"""Coordinate transforms: relative offsets + normalization (+ inverses).

BASELINE.json:5 requires "relative-coordinate transforms" and "device-side
normalization"; metrics are reported in world meters after the inverse
transform (SURVEY.md §2.1).  All functions are shape-polymorphic and work on
NumPy or JAX arrays, so the same code runs host-side in the loader and
device-side inside jit.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np


class NormStats(NamedTuple):
    """Per-axis mean/std of one-step displacements (dxy), in meters."""

    mean: np.ndarray  # (2,)
    std: np.ndarray  # (2,)


def to_relative(xy):
    """Absolute positions (..., T, 2) -> per-step offsets with dxy[..., 0, :] = 0."""
    np_ = _backend(xy)
    dxy = np_.diff(xy, axis=-2)
    zero = np_.zeros_like(xy[..., :1, :])
    return np_.concatenate([zero, dxy], axis=-2)


def integrate(last_xy, dxy):
    """Inverse of to_relative for rollouts: cumulative-sum offsets from last_xy.

    last_xy: (..., 2) anchor position; dxy: (..., T, 2) offsets where dxy[..., t, :]
    is the displacement from step t-1 to t (t=0 displaces from the anchor).
    Returns absolute (..., T, 2).
    """
    np_ = _backend(dxy)
    return last_xy[..., None, :] + np_.cumsum(dxy, axis=-2)


def compute_norm_stats(windows: Sequence[np.ndarray], obs_len: int) -> NormStats:
    """Dataset-level dxy mean/std from the *observed* part of training windows.

    Computed host-side once; applied device-side (normalize/denormalize are
    traced into the jitted step — BASELINE.json:5 "device-side normalization").
    """
    deltas = [np.diff(w[:, :obs_len], axis=1).reshape(-1, 2) for w in windows if w.shape[0]]
    if not deltas:
        return NormStats(np.zeros(2, np.float32), np.ones(2, np.float32))
    d = np.concatenate(deltas, axis=0)
    std = d.std(axis=0)
    std = np.where(std < 1e-6, 1.0, std)
    return NormStats(d.mean(axis=0).astype(np.float32), std.astype(np.float32))


def normalize(dxy, stats: NormStats):
    return (dxy - stats.mean) / stats.std


def denormalize(dxy_n, stats: NormStats):
    return dxy_n * stats.std + stats.mean


def augment_windows(xy, mask, key, rotate: bool = True, flip: bool = False):
    """Random per-window rotation (and optional reflection) of world coords.

    xy (B, N, T, 2) absolute meters, mask (B, N) -> augmented xy, same shape.
    Device-side (traced into the jitted train step).  Training loss consumes
    only per-step offsets and pairwise distances: distances are invariant
    under the orthogonal map, offsets rotate with it, and padded rows stay
    exactly zero (rotating zeros).  The mask is untouched.

    ``flip`` composes a random y-reflection with the rotation, covering both
    orientations of every path shape.
    """
    import jax
    import jax.numpy as jnp

    B = xy.shape[0]
    kr, kf = jax.random.split(key)
    if rotate:
        theta = jax.random.uniform(kr, (B,), minval=0.0, maxval=2.0 * jnp.pi)
    else:
        theta = jnp.zeros((B,), jnp.float32)
    c, s = jnp.cos(theta), jnp.sin(theta)
    if flip:
        det = jnp.where(jax.random.bernoulli(kf, 0.5, (B,)), -1.0, 1.0)
    else:
        det = jnp.ones((B,), jnp.float32)
    # Row 2 scaled by det: det=+1 is a proper rotation, det=-1 composes a
    # y-reflection after it; both are orthogonal (distance-preserving).
    rot = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([det * s, det * c], axis=-1)],
        axis=-2,
    )  # (B, 2, 2)
    del mask  # padded rows are zeros; the orthogonal map keeps them zero
    return jnp.einsum("bij,bntj->bnti", rot, xy)


def _backend(x):
    # jnp arrays expose .device / __jax_array__; cheap duck-typing keeps this
    # module importable without jax for host-only tooling.
    if type(x).__module__.startswith("jax") or "Array" in type(x).__name__:
        import jax.numpy as jnp

        return jnp
    return np

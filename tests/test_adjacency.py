"""Adjacency builder vs brute-force NumPy (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from mmtraj.graph.adjacency import pairwise_sq_dists, proximity_adjacency


def _brute_force(xy, mask, radius):
    B, N, _ = xy.shape
    adj = np.zeros((B, N, N), dtype=bool)
    for b in range(B):
        for i in range(N):
            for j in range(N):
                if i == j or not (mask[b, i] and mask[b, j]):
                    continue
                d = np.linalg.norm(xy[b, i] - xy[b, j])
                adj[b, i, j] = (radius <= 0) or (d <= radius)
    return adj


def test_pairwise_dists(rng):
    xy = rng.normal(size=(2, 6, 2)).astype(np.float32)
    d2 = np.asarray(pairwise_sq_dists(jnp.asarray(xy)))
    for b in range(2):
        for i in range(6):
            for j in range(6):
                expect = ((xy[b, i] - xy[b, j]) ** 2).sum()
                np.testing.assert_allclose(d2[b, i, j], expect, rtol=1e-5)


def test_proximity_vs_brute_force(rng):
    xy = (rng.normal(size=(3, 8, 2)) * 3).astype(np.float32)
    mask = rng.random((3, 8)) > 0.3
    for radius in (2.0, 5.0, -1.0):
        got = np.asarray(proximity_adjacency(jnp.asarray(xy), jnp.asarray(mask), radius))
        np.testing.assert_array_equal(got, _brute_force(xy, mask, radius))


def test_adjacency_symmetric_no_self(rng):
    xy = rng.normal(size=(1, 10, 2)).astype(np.float32)
    mask = np.ones((1, 10), bool)
    adj = np.asarray(proximity_adjacency(jnp.asarray(xy), jnp.asarray(mask), 4.0))
    assert not np.diagonal(adj, axis1=1, axis2=2).any()
    np.testing.assert_array_equal(adj, np.swapaxes(adj, 1, 2))

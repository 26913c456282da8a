"""Diverse K-subset selection (mmtraj/models/sampling.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtraj.models.sampling import diverse_select, diverse_select_joint


def _preds(rng, R=12, B=2, N=3, T=4):
    return jnp.asarray(rng.normal(size=(R, B, N, T, 2)).astype(np.float32))


def test_shapes_and_identity():
    rng = np.random.default_rng(0)
    p = _preds(rng)
    out = diverse_select(p, 5)
    assert out.shape == (5, 2, 3, 4, 2)
    np.testing.assert_array_equal(np.asarray(diverse_select(p, 12)), np.asarray(p))
    with pytest.raises(ValueError, match="cannot select"):
        diverse_select(p, 13)


def test_selected_are_input_trajectories():
    """Every selected trajectory must be one of the candidates, untouched."""
    rng = np.random.default_rng(1)
    p = _preds(rng)
    out = np.asarray(diverse_select(p, 4))
    pn = np.asarray(p)
    for k in range(4):
        for b in range(2):
            for n in range(3):
                match = np.isclose(pn[:, b, n], out[k, b, n]).all(axis=(1, 2))
                assert match.any()


def test_no_duplicates_when_endpoints_distinct():
    """With all-distinct endpoints, greedy max-min never re-picks a chosen
    candidate (its distance-to-chosen is 0 while others are positive)."""
    rng = np.random.default_rng(2)
    p = _preds(rng, R=8)
    out = np.asarray(diverse_select(p, 8 - 1))
    for b in range(2):
        for n in range(3):
            ends = out[:, b, n, -1]
            assert len(np.unique(ends.round(6), axis=0)) == len(ends)


def test_farthest_point_picks_the_outlier():
    """One candidate far from the cluster must be selected second."""
    p = np.zeros((5, 1, 1, 2, 2), np.float32)
    p[:, 0, 0, -1, 0] = [0.0, 0.1, 0.2, 50.0, 0.3]  # candidate 3 is the outlier
    out = np.asarray(diverse_select(jnp.asarray(p), 2))
    assert out[0, 0, 0, -1, 0] == 0.0  # seed = sample 0
    assert out[1, 0, 0, -1, 0] == 50.0


def test_joint_selection_preserves_joint_samples():
    """diverse_select_joint keeps whole joint samples: for each (k, window)
    there is ONE candidate index r that every agent's trajectory comes from."""
    rng = np.random.default_rng(4)
    p = _preds(rng, R=10, B=3, N=4)
    mask = jnp.asarray(np.ones((3, 4), bool))
    out = np.asarray(diverse_select_joint(p, mask, 5))
    pn = np.asarray(p)
    assert out.shape == (5, 3, 4, 4, 2)
    for k in range(5):
        for b in range(3):
            # all-agent match against a single candidate index
            match = np.isclose(pn[:, b], out[k, b]).all(axis=(1, 2, 3))
            assert match.any(), (k, b)
    # seed sample 0 leads, identity at K == R, over-selection rejected
    np.testing.assert_array_equal(out[0], pn[0])
    np.testing.assert_array_equal(
        np.asarray(diverse_select_joint(p, mask, 10)), pn)
    with pytest.raises(ValueError, match="cannot select"):
        diverse_select_joint(p, mask, 11)


def test_joint_selection_masked_agents_ignored():
    """Padded agents must not influence which joint samples are chosen."""
    rng = np.random.default_rng(5)
    p = np.asarray(_preds(rng, R=6, B=1, N=3))
    mask = np.array([[True, True, False]])
    # Give the padded agent a huge spread on candidate 1 — it must NOT drag
    # candidate 1 into the selection if the valid agents say otherwise.
    p2 = p.copy()
    p2[1, 0, 2, -1] = 1e6
    s1 = np.asarray(diverse_select_joint(jnp.asarray(p), jnp.asarray(mask), 3))
    s2 = np.asarray(diverse_select_joint(jnp.asarray(p2), jnp.asarray(mask), 3))
    # Selection indices identical -> valid-agent trajectories identical.
    np.testing.assert_array_equal(s1[:, :, :2], s2[:, :, :2])


def test_jits_and_widens_min_pairwise_spread():
    """Runs under jit; and the selected subset's min pairwise endpoint
    distance (the max-min objective) is much larger than the i.i.d. first-K
    subset's, averaged over agents.  (Whether wider coverage lowers best-of-K
    error depends on how underdispersed the sampler is relative to the
    target — measured per-model in RESULTS.md, not assumed here.)"""
    rng = np.random.default_rng(3)
    p = _preds(rng, R=16, B=32, N=32)
    sel = jax.jit(lambda x: diverse_select(x, 4))(p)

    def min_pairwise(s):
        end = np.asarray(s)[..., -1, :]  # (K, B, N, 2)
        d = np.linalg.norm(end[:, None] - end[None, :], axis=-1)  # (K,K,B,N)
        K = d.shape[0]
        d[np.arange(K), np.arange(K)] = np.inf
        return d.min(axis=(0, 1)).mean()

    assert min_pairwise(sel) > 1.5 * min_pairwise(np.asarray(p)[:4])

"""ADE/FDE vs hand-computed toy trajectories; masked best-of-K (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from mmtraj.metrics import ade_fde, best_of_k, displacement_errors


def test_hand_computed_ade_fde():
    gt = jnp.zeros((1, 1, 4, 2))
    pred = jnp.asarray(
        np.array([[[[3, 4], [0, 0], [0, 1], [6, 8]]]], np.float32)
    )  # dists 5, 0, 1, 10
    ade, fde = displacement_errors(pred, gt)
    np.testing.assert_allclose(np.asarray(ade), 4.0)
    np.testing.assert_allclose(np.asarray(fde), 10.0)


def test_masked_mean_ignores_padding():
    gt = jnp.zeros((1, 3, 2, 2))
    pred = jnp.asarray(
        np.stack(
            [np.full((2, 2), 1.0), np.full((2, 2), 2.0), np.full((2, 2), 999.0)]
        )[None].astype(np.float32)
    )
    mask = jnp.asarray([[True, True, False]])
    ade, _ = ade_fde(pred, gt, mask)
    # dists: agent0 sqrt(2), agent1 2*sqrt(2); padded agent excluded
    np.testing.assert_allclose(np.asarray(ade), 1.5 * np.sqrt(2), rtol=1e-6)


def test_best_of_k_reduces_per_agent():
    gt = jnp.zeros((1, 2, 3, 2))
    # K=2 samples; agent0 best in sample 1, agent1 best in sample 0.
    preds = np.zeros((2, 1, 2, 3, 2), np.float32)
    preds[0, 0, 0] = 5.0  # sample0 agent0 bad
    preds[1, 0, 0] = 1.0  # sample1 agent0 good
    preds[0, 0, 1] = 2.0
    preds[1, 0, 1] = 7.0
    mask = jnp.asarray([[True, True]])
    ade, fde = best_of_k(jnp.asarray(preds), gt, mask)
    expect = (np.sqrt(2) * 1 + np.sqrt(2) * 2) / 2
    np.testing.assert_allclose(np.asarray(ade), expect, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fde), expect, rtol=1e-6)


def test_best_of_k_masked(rng):
    preds = jnp.asarray(rng.normal(size=(5, 2, 4, 6, 2)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(2, 4, 6, 2)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 0, 0], [1, 0, 0, 0]], bool))
    # changing padded-agent predictions must not change the metric
    a1, f1 = best_of_k(preds, gt, mask)
    preds2 = preds.at[:, :, 2:].add(1e3)
    a2, f2 = best_of_k(preds2, gt, mask)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))


def test_miss_rate_hand_computed():
    from mmtraj.metrics import miss_rate

    # 2 agents, 1 sample; agent0 lands 3m off (miss), agent1 exact (hit).
    gt = jnp.zeros((1, 2, 4, 2))
    pred = jnp.zeros((1, 1, 2, 4, 2))
    pred = pred.at[0, 0, 0, -1, 0].set(3.0)
    mask = jnp.ones((1, 2), bool)
    assert float(miss_rate(pred, gt, mask)) == 0.5
    # masking the missing agent out -> 0
    assert float(miss_rate(pred, gt, jnp.asarray([[False, True]]))) == 0.0


def test_collision_rate_hand_computed():
    from mmtraj.metrics import collision_rate

    # 3 agents: 0 and 1 pass within 0.1m at step 2; agent 2 stays far away.
    K, B, N, T = 1, 1, 3, 4
    pred = np.zeros((K, B, N, T, 2), np.float32)
    pred[0, 0, 0] = [[0, 0], [1, 0], [2, 0], [3, 0]]
    pred[0, 0, 1] = [[0, 5], [1, 5], [2, 0.05], [3, 5]]
    pred[0, 0, 2] = [[50, 50], [51, 50], [52, 50], [53, 50]]
    mask = jnp.ones((B, N), bool)
    rate = float(collision_rate(jnp.asarray(pred), mask))
    np.testing.assert_allclose(rate, 2.0 / 3.0)  # agents 0 and 1 collide
    # padded agent at a colliding position must not count
    mask2 = jnp.asarray([[True, False, True]])
    assert float(collision_rate(jnp.asarray(pred), mask2)) == 0.0

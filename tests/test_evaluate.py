"""Evaluator correctness: padded final batches must not bias metrics."""

import jax
import numpy as np
import pytest

from mmtraj.config import ModelConfig
from mmtraj.data.collate import WindowDataset
from mmtraj.data.transforms import NormStats
from mmtraj.evaluate import evaluate
from mmtraj.models.forecaster import Forecaster


def _windows(rng, n_windows, n_agents=4):
    out = []
    for _ in range(n_windows):
        steps = rng.normal(size=(n_agents, 20, 2)).astype(np.float32) * 0.3
        out.append(np.cumsum(steps, axis=1))
    return out


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    model = Forecaster(ModelConfig(num_heads=2), 8, 12)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.3, np.float32))
    return rng, model, params, stats


def test_batch_size_invariance(setup):
    """Same windows, different batch sizes (with/without padded final batch)
    -> identical aggregate metrics (exact-sum aggregation)."""
    rng, model, params, stats = setup
    ds = WindowDataset(_windows(rng, 13), n_max=8)
    m_a = evaluate(model, params, stats, ds, k=3, batch_size=13, seed=0)
    m_b = evaluate(model, params, stats, ds, k=3, batch_size=4, seed=0)
    m_c = evaluate(model, params, stats, ds, k=3, batch_size=5, seed=0)
    # Per-batch RNG keys differ, so compare agent counts exactly and metrics
    # statistically (same windows, same K, same model).
    assert m_a["n_agents"] == m_b["n_agents"] == m_c["n_agents"] == 13 * 4
    assert abs(m_a["min_ade"] - m_b["min_ade"]) < 0.15
    assert abs(m_a["min_fde"] - m_c["min_fde"]) < 0.4


def test_metrics_are_finite_and_positive(setup):
    rng, model, params, stats = setup
    ds = WindowDataset(_windows(rng, 6), n_max=8)
    m = evaluate(model, params, stats, ds, k=2, batch_size=4)
    assert np.isfinite(m["min_ade"]) and m["min_ade"] > 0
    assert np.isfinite(m["min_fde"]) and m["min_fde"] > 0
    assert m["n_windows"] == 6


def test_higher_k_never_hurts(setup):
    """Best-of-K is monotonically non-increasing in K (same seed stream)."""
    rng, model, params, stats = setup
    ds = WindowDataset(_windows(rng, 8), n_max=8)
    m1 = evaluate(model, params, stats, ds, k=1, batch_size=8, seed=0)
    m20 = evaluate(model, params, stats, ds, k=20, batch_size=8, seed=0)
    assert m20["min_ade"] <= m1["min_ade"] + 1e-6

"""Visualization rendering test (Agg backend, no display)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mmtraj.config import ModelConfig
from mmtraj.data.transforms import NormStats
from mmtraj.models.forecaster import Forecaster
from mmtraj.utils.viz import render_predictions
import pytest


pytestmark = pytest.mark.slow  # scan-heavy; quick subset: -m "not slow"


def test_render_predictions_writes_png(tmp_path, rng):
    model = Forecaster(ModelConfig(num_heads=2), 8, 12)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.3, np.float32))
    steps = rng.normal(size=(4, 5, 20, 2)).astype(np.float32) * 0.3
    xy = jnp.asarray(np.cumsum(steps, axis=2))
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0]] * 4, bool))
    rollouts = model.rollout_k(params, xy[:, :, :8], mask, stats, jax.random.PRNGKey(1), 3)
    out = str(tmp_path / "pred.png")
    render_predictions(out, np.asarray(xy), np.asarray(mask), np.asarray(rollouts), 8)
    assert os.path.getsize(out) > 10_000  # non-trivial image

"""Golden-output parity harness over checked-in fixture data (SURVEY.md §4).

``tests/fixtures/scene_small.txt`` is a fixed-seed ETH/UCY-format annotation
file (synthetic; the real data and the reference repo are absent from this
environment — SURVEY.md §0).  These tests pin the whole data pipeline and a
fixed-seed forward pass to recorded values, so any accidental drift in
parsing, windowing, normalization, or model math fails loudly.  When the
reference ever becomes visible, its outputs on this same file slot in as
additional golden rows.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mmtraj.config import ModelConfig
from mmtraj.data.collate import WindowDataset
from mmtraj.data.parser import read_annotation_file
from mmtraj.data.transforms import compute_norm_stats
from mmtraj.data.windower import make_windows
from mmtraj.models.forecaster import Forecaster
import pytest

pytestmark = pytest.mark.slow  # scan-heavy; quick subset: -m "not slow"


FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "scene_small.txt")


def _pipeline():
    rows = read_annotation_file(FIXTURE)
    windows = make_windows(rows, 8, 12)
    stats = compute_norm_stats(windows, 8)
    return rows, windows, stats


def test_pipeline_golden_values():
    rows, windows, stats = _pipeline()
    assert rows.shape == (1142, 4)
    assert len(windows) == 61
    np.testing.assert_allclose(
        windows[0][0, 0], [7.761166, 14.496451], atol=1e-5
    )
    np.testing.assert_allclose(
        windows[-1][-1, -1], [0.980708, 6.750609], atol=1e-5
    )
    np.testing.assert_allclose(
        stats.mean, [0.0078553427, 0.0004957261], atol=1e-7
    )
    np.testing.assert_allclose(
        stats.std, [0.3132140, 0.3125575], atol=1e-6
    )


def test_forward_golden_values():
    """Fixed-seed params + fixture batch -> recorded loss and rollout mean.

    Values recorded on CPU (the test platform, conftest forces it); loose
    tolerance absorbs XLA version-to-version reassociation drift.
    """
    _, windows, stats = _pipeline()
    ds = WindowDataset(windows, 8)
    xy, mask = jnp.asarray(ds.xy[:16]), jnp.asarray(ds.mask[:16])
    model = Forecaster(ModelConfig(num_heads=2), 8, 12)
    params = model.init(jax.random.PRNGKey(42))
    loss, _ = model.loss(params, xy, mask, stats)
    np.testing.assert_allclose(float(loss), 3.6956501, rtol=1e-4)
    roll = model.rollout_k(params, xy[:, :, :8], mask, stats, jax.random.PRNGKey(7), 4)
    assert roll.shape == (4, 16, 8, 12, 2)
    np.testing.assert_allclose(float(roll.mean()), 4.1344428, rtol=1e-3)

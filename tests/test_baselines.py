"""Closed-form baselines (mmtraj/baselines.py) + the `cli baseline` command."""

import numpy as np
import pytest

from mmtraj.baselines import constant_velocity, evaluate_baseline, zero_velocity
from mmtraj.data.collate import WindowDataset

OBS, PRED = 8, 12


def test_cv_exact_on_linear_motion():
    """CV is exact (zero error) for agents that truly move at constant
    velocity — the defining property."""
    t = np.arange(OBS + PRED, dtype=np.float32)
    v = np.array([[0.5, -0.2], [0.0, 1.0]], np.float32)  # (N, 2)
    xy = v[:, None, :] * t[None, :, None] + np.float32(3.0)  # (N, T, 2)
    ds = WindowDataset([xy], n_max=4)
    m = evaluate_baseline(ds, OBS, "cv")
    assert m["min_ade"] < 1e-5 and m["min_fde"] < 1e-5
    assert m["k"] == 1 and m["baseline"] == "cv"


def test_zv_freezes_last_position():
    rng = np.random.default_rng(0)
    obs = np.cumsum(rng.normal(size=(3, OBS, 2)), axis=1).astype(np.float32)
    pred = zero_velocity(obs, PRED)
    assert pred.shape == (3, PRED, 2)
    np.testing.assert_array_equal(pred, np.broadcast_to(obs[:, -1:], pred.shape))


def test_cv_extrapolates_last_offset():
    obs = np.zeros((1, OBS, 2), np.float32)
    obs[0, -1] = [1.0, 2.0]  # last offset = (1, 2) from the origin
    pred = constant_velocity(obs, 3)
    np.testing.assert_allclose(pred[0], [[2, 4], [3, 6], [4, 8]])


def test_evaluate_baseline_masks_padding():
    """Padded (invalid) agents must not move the metric."""
    t = np.arange(OBS + PRED, dtype=np.float32)
    xy = np.stack([t, t], axis=-1)[None]  # one diagonal walker (1, T, 2)
    small = evaluate_baseline(WindowDataset([xy], n_max=1), OBS, "cv")
    padded = evaluate_baseline(WindowDataset([xy], n_max=16), OBS, "cv")
    assert small["min_ade"] == padded["min_ade"]
    assert padded["n_agents"] == 1


def test_unknown_baseline_raises():
    ds = WindowDataset([np.zeros((1, OBS + PRED, 2), np.float32)], 2)
    with pytest.raises(ValueError, match="unknown baseline"):
        evaluate_baseline(ds, OBS, "oracle")


def test_cli_baseline_runs(tmp_path, capsys):
    from mmtraj.cli import main
    from mmtraj.data.synthetic import write_synthetic_dataset

    write_synthetic_dataset(str(tmp_path), seed=0, n_frames=60)
    rc = main(["baseline", "--data-dir", str(tmp_path), "--scene", "zara1",
               "--baseline", "cv"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "CV" in out and "ADE=" in out

"""Data-parallel mesh tests on the virtual 8-device CPU mesh (SURVEY.md §4
"distributed-without-a-cluster"; BASELINE.json:11).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtraj.config import ModelConfig, get_config
from mmtraj.data.transforms import NormStats
from mmtraj.models.forecaster import Forecaster
from mmtraj.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from mmtraj.train import fit, make_optimizer, make_train_step


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8  # conftest forced CPU x8
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)


def test_shard_batch_places_on_mesh():
    mesh = make_mesh()
    xy = np.zeros((16, 4, 20, 2), np.float32)
    sharded = shard_batch(jnp.asarray(xy), mesh)
    assert len(sharded.sharding.device_set) == 8


def test_parallel_step_matches_single_device(rng):
    """One DP step over 8 devices must match the single-device step."""
    cfg = ModelConfig(cell="gru", social=True, head="gmm", num_heads=2)
    model = Forecaster(cfg, 8, 12)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.ones(2, np.float32))
    opt = make_optimizer(get_config("3"))
    opt_state = opt.init(params)

    xy = jnp.asarray(rng.normal(size=(16, 6, 20, 2)).astype(np.float32))
    mask = jnp.asarray(rng.random((16, 6)) > 0.3)

    step_single = make_train_step(model, opt, stats, mesh=None)
    p1, _, l1 = step_single(params, opt_state, xy, mask)  # donates params/opt_state

    mesh = make_mesh()
    params2 = model.init(jax.random.PRNGKey(0))  # fresh copy (same key => same values)
    params_r = jax.device_put(params2, replicated(mesh))
    opt_r = jax.device_put(opt.init(params2), replicated(mesh))
    step_dp = make_train_step(model, opt, stats, mesh=mesh)
    xy_s, mask_s = shard_batch((xy, mask), mesh)
    p2, _, l2 = step_dp(params_r, opt_r, xy_s, mask_s)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sharded_eval_matches_single_device(synth_dir):
    """evaluate() with a mesh (batch sharded over 8 CPU devices) reports the
    same best-of-K metrics as the single-device path — same program, same
    keys, only the sharding differs."""
    from mmtraj.data.collate import WindowDataset
    from mmtraj.data.registry import load_scene_windows
    from mmtraj.evaluate import evaluate

    cfg = get_config("3")
    model = Forecaster(cfg.model, 8, 12)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    windows = load_scene_windows(synth_dir, "zara2", 8, 12)
    ds = WindowDataset(windows[:40], cfg.data.n_max)

    m1 = evaluate(model, params, stats, ds, k=3, batch_size=16, mesh=None)
    m2 = evaluate(model, params, stats, ds, k=3, batch_size=16, mesh=make_mesh())
    assert m1["n_agents"] == m2["n_agents"]
    np.testing.assert_allclose(m1["min_ade"], m2["min_ade"], rtol=1e-5)
    np.testing.assert_allclose(m1["min_fde"], m2["min_fde"], rtol=1e-5)


def test_fit_data_parallel_smoke(synth_dir, tmp_path):
    """config-5-style DP training descends on the 8-device CPU mesh."""
    cfg = get_config("5")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, data_dir=synth_dir, scene="zara2", n_max=24),
        train=dataclasses.replace(
            cfg.train, steps=24, batch_size=16, eval_every=0, log_every=8,
            k_samples=2, out_dir=str(tmp_path / "dp"),
        ),
    )
    result = fit(cfg)
    assert result.history[-1][1] < result.history[0][1]
    assert np.isfinite(result.history[-1][1])

"""StableHLO export/reload round-trip (mmtraj/export.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtraj.config import ModelConfig
from mmtraj.data.transforms import NormStats
from mmtraj.export import export_predictor, load_predictor, make_predictor
from mmtraj.models.forecaster import Forecaster
import pytest


pytestmark = pytest.mark.slow  # scan-heavy; quick subset: -m "not slow"


def test_export_roundtrip_matches_live_model(rng, tmp_path):
    cfg = ModelConfig(num_heads=2)
    model = Forecaster(cfg, 8, 12)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    B, N, K = 4, 8, 3
    path = str(tmp_path / "predictor.stablehlo")
    export_predictor(path, model, params, stats, k=K, batch=B, n_agents=N,
                     platform="cpu")

    steps = rng.normal(size=(B, N, 8, 2)).astype(np.float32) * 0.3
    xy_obs = jnp.asarray(np.cumsum(steps, axis=2))
    mask = jnp.asarray(rng.random((B, N)) > 0.2)

    live = make_predictor(model, params, stats, K)(xy_obs, mask, 7)
    loaded = load_predictor(path)(xy_obs, mask, 7)
    assert loaded.shape == (K, B, N, 12, 2)
    np.testing.assert_allclose(np.asarray(loaded), np.asarray(live),
                               atol=1e-5, rtol=1e-5)


def test_export_with_oversample_bakes_selection(rng, tmp_path):
    """An oversample export returns K (not R*K) trajectories, matches the
    live sample-and-select path, and differs from the plain-K artifact."""
    cfg = ModelConfig(num_heads=2)
    model = Forecaster(cfg, 8, 12)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    B, N, K = 4, 8, 3
    path = str(tmp_path / "predictor_os.stablehlo")
    export_predictor(path, model, params, stats, k=K, batch=B, n_agents=N,
                     platform="cpu", oversample=2)

    steps = rng.normal(size=(B, N, 8, 2)).astype(np.float32) * 0.3
    xy_obs = jnp.asarray(np.cumsum(steps, axis=2))
    mask = jnp.asarray(rng.random((B, N)) > 0.2)

    live = make_predictor(model, params, stats, K, oversample=2)(xy_obs, mask, 7)
    loaded = load_predictor(path)(xy_obs, mask, 7)
    assert loaded.shape == (K, B, N, 12, 2)
    np.testing.assert_allclose(np.asarray(loaded), np.asarray(live),
                               atol=1e-5, rtol=1e-5)
    plain = make_predictor(model, params, stats, K)(xy_obs, mask, 7)
    assert not np.allclose(np.asarray(loaded), np.asarray(plain))


def test_export_requires_n_agents(rng, tmp_path):
    cfg = ModelConfig(num_heads=2)
    model = Forecaster(cfg, 4, 3)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    with pytest.raises(ValueError, match="n_agents"):
        export_predictor(str(tmp_path / "p.hlo"), model, params, stats,
                         platform="cpu")


def test_export_rejects_pallas_pins_for_cpu_target(rng, tmp_path):
    """Explicit TPU-kernel pins cannot lower for a CPU target — a loud
    error, not an artifact that crashes at call time."""
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    for field in ("use_pallas", "use_fused_decoder"):
        cfg = ModelConfig(num_heads=2, **{field: True})
        model = Forecaster(cfg, 4, 3)
        params = model.init(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="Pallas"):
            export_predictor(str(tmp_path / "p.hlo"), model, params, stats,
                             n_agents=8, platform="cpu")
    cfg = ModelConfig(num_heads=2, attend_kernel="pallas")
    model = Forecaster(cfg, 4, 3)
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="Pallas"):
        export_predictor(str(tmp_path / "p.hlo"), model, params, stats,
                         n_agents=8, platform="cpu")


def test_export_for_tpu_resolves_auto_attend_statically(rng, tmp_path):
    """Exporting FOR tpu from this CPU session at lane-filling N must bake
    the Pallas attend kernel (the runtime auto rule keyed on the session
    backend would silently lose it); the artifact serializes fine — Mosaic
    lowering needs no TPU device, and the cross-exported artifact was
    verified to execute on the real chip (finite K-sample output)."""
    cfg = ModelConfig(num_heads=2)
    model = Forecaster(cfg, 4, 3)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    path = str(tmp_path / "tpu.hlo")
    export_predictor(path, model, params, stats, k=2, batch=2, n_agents=128,
                     platform="tpu")
    blob = open(path, "rb").read()
    assert len(blob) > 0
    assert b"pallas_call" in blob  # the Pallas attend kernel is baked in

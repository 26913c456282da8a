"""Fused whole-rollout decoder: kernel == jnp reference on identical randoms;
statistical agreement with the unfused path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtraj.config import ModelConfig
from mmtraj.data.transforms import NormStats
from mmtraj.models.forecaster import Carry, Forecaster
from mmtraj.models import gmm
from mmtraj.ops.fused_decoder import fused_decode, permute_head, reference_decode

pytestmark = pytest.mark.slow  # scan-heavy; quick subset: -m "not slow"


CFG = ModelConfig(cell="gru", social=True, head="gmm", num_heads=2,
                  adjacency_radius=4.0)


def _setup(rng, B=4, N=8):
    model = Forecaster(CFG, 8, 12)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    h0 = jnp.asarray(rng.normal(size=(B, N, CFG.hidden_dim)).astype(np.float32))
    xy0 = jnp.asarray((rng.normal(size=(B, N, 2)) * 3).astype(np.float32))
    mask = jnp.asarray(rng.random((B, N)) > 0.25)
    T, M = 12, CFG.num_mixtures
    gumbel = jax.random.gumbel(jax.random.PRNGKey(7), (B, T, N, M))
    normal = jax.random.normal(jax.random.PRNGKey(8), (B, T, N, 2))
    return model, params, stats, h0, xy0, mask, gumbel, normal


def _run(fn, params, stats, h0, xy0, mask, gumbel, normal):
    hw, hb = permute_head(params["head"]["w"], params["head"]["b"], CFG.num_mixtures)
    return fn(
        h0, xy0, mask, gumbel, normal, params["dec"], hw, hb,
        num_heads=CFG.num_heads, num_mixtures=CFG.num_mixtures,
        radius=CFG.adjacency_radius, sigma_min=CFG.sigma_min,
        rho_max=CFG.rho_max, stats_mean=stats.mean, stats_std=stats.std,
    )


def test_kernel_matches_reference(rng):
    model, params, stats, h0, xy0, mask, gumbel, normal = _setup(rng)
    ref = _run(reference_decode, params, stats, h0, xy0, mask, gumbel, normal)
    got = _run(fused_decode, params, stats, h0, xy0, mask, gumbel, normal)
    assert got.shape == ref.shape == (4, 12, 8, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_reference_matches_unfused_decoder_single_mixture(rng):
    """With M=1 the component choice is deterministic, so the unfused
    decode_rollout and reference_decode sample IDENTICAL trajectories when
    fed the same normals — a direct semantic pin between the two pipelines."""
    cfg1 = dataclasses.replace(CFG, num_mixtures=1)
    model = Forecaster(cfg1, 8, 12)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    B, N, T = 3, 6, 12
    h0 = jnp.asarray(rng.normal(size=(B, N, cfg1.hidden_dim)).astype(np.float32))
    xy0 = jnp.asarray((rng.normal(size=(B, N, 2)) * 3).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool))

    # Reconstruct the unfused path's randoms: decode_rollout draws them all
    # up front as (B, T, N, ...) under split(key) = (gumbel_key, normal_key).
    key = jax.random.PRNGKey(5)
    _, kn = jax.random.split(key)
    normal = jax.random.normal(kn, (B, T, N, 2), jnp.float32)
    gumbel = jnp.zeros((B, T, N, 1))  # M=1: component choice is a no-op

    hw, hb = permute_head(params["head"]["w"], params["head"]["b"], 1)
    ref = reference_decode(
        h0, xy0, mask, gumbel, normal, params["dec"], hw, hb,
        num_heads=cfg1.num_heads, num_mixtures=1, radius=cfg1.adjacency_radius,
        sigma_min=cfg1.sigma_min, rho_max=cfg1.rho_max,
        stats_mean=stats.mean, stats_std=stats.std,
    )
    unfused = model.decode_rollout(
        params, Carry(h=h0, c=jnp.zeros_like(h0)), xy0, mask, stats, key
    )  # (B, N, T, 2)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(jnp.moveaxis(unfused, 1, 2)), atol=1e-4, rtol=1e-4
    )


def test_rollout_k_fused_exact(rng):
    """Fused and unfused K-rollouts consume the SAME random stream (one
    batched draw under split(key)), so with the same key the sampled
    trajectories are identical to float tolerance — an end-to-end pin of the
    whole kernel against the XLA path."""
    model_u = Forecaster(CFG, 8, 12)
    model_f = Forecaster(dataclasses.replace(CFG, use_fused_decoder=True), 8, 12)
    params = model_u.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    steps = rng.normal(size=(2, 8, 8, 2)).astype(np.float32) * 0.3
    xy_obs = jnp.asarray(np.cumsum(steps, axis=2))
    mask = jnp.asarray(rng.random((2, 8)) > 0.2)
    K = 16
    key = jax.random.PRNGKey(1)
    ru = np.asarray(model_u.rollout_k(params, xy_obs, mask, stats, key, K))
    rf = np.asarray(model_f.rollout_k(params, xy_obs, mask, stats, key, K))
    assert rf.shape == ru.shape
    m = np.asarray(mask)[None, :, :, None, None]  # compare valid agents only
    np.testing.assert_allclose(rf * m, ru * m, atol=2e-3, rtol=1e-3)


def test_padding_invariance_fused(rng):
    model, params, stats, h0, xy0, mask, gumbel, normal = _setup(rng)
    noise = jnp.asarray(rng.normal(size=np.asarray(xy0).shape).astype(np.float32)) * 100
    xy0_b = jnp.where(mask[..., None], xy0, xy0 + noise)
    a = _run(fused_decode, params, stats, h0, xy0, mask, gumbel, normal)
    b = _run(fused_decode, params, stats, h0, xy0_b, mask, gumbel, normal)
    m = np.asarray(mask)
    for w in range(4):
        np.testing.assert_allclose(
            np.asarray(a)[w][:, m[w]], np.asarray(b)[w][:, m[w]], atol=1e-4
        )


def test_fused_rollout_under_jit_with_traced_stats(rng):
    """Regression: normalization stats are jit-traced in evaluate/predict;
    the fused path must not concretize them (it used to call float())."""
    model = Forecaster(dataclasses.replace(CFG, use_fused_decoder=True), 8, 12)
    params = model.init(jax.random.PRNGKey(0))
    steps = rng.normal(size=(2, 8, 8, 2)).astype(np.float32) * 0.3
    xy_obs = jnp.asarray(np.cumsum(steps, axis=2))
    mask = jnp.asarray(np.ones((2, 8), bool))

    @jax.jit
    def run(p, x, m, mean, std, key):
        return model.rollout_k(p, x, m, NormStats(mean, std), key, 4)

    out = run(params, xy_obs, mask, jnp.zeros(2), jnp.full(2, 0.4),
              jax.random.PRNGKey(1))
    assert out.shape == (4, 2, 8, 12, 2)
    assert bool(jnp.isfinite(out).all())

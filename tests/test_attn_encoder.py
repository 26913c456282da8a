"""Spatio-temporal attention encoder tests (ModelConfig.encoder="attn").

The attention encoder swaps the RNN recurrence for causal temporal
self-attention interleaved with the same per-frame social GAT
(mmtraj/models/attn_encoder.py).  These tests pin the properties that make it
a drop-in second encoder family: mask correctness (padded agents are inert),
causality (step t never sees steps > t), full composition with every
loss/rollout/eval path, remat equivalence, and the interop guard (no
reference convention exists for this family).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtraj.config import ModelConfig
from mmtraj.data.transforms import NormStats
from mmtraj.models.attn_encoder import _temporal_mhsa, sinusoidal_positions
from mmtraj.models.forecaster import Forecaster

OBS, PRED = 4, 3


def _batch(rng, B=2, N=5, scale=3.0):
    steps = rng.normal(size=(B, N, OBS + PRED, 2)).astype(np.float32) * 0.3
    xy = np.cumsum(steps, axis=2) + rng.normal(size=(B, N, 1, 2)).astype(np.float32) * scale
    mask = np.ones((B, N), bool)
    mask[:, -1] = False
    return jnp.asarray(xy), jnp.asarray(mask)


def _stats():
    return NormStats(np.zeros(2, np.float32), np.full(2, 0.3, np.float32))


ATTN_CFGS = [
    ModelConfig(encoder="attn", cell="gru", social=True, head="gmm", num_heads=4),
    ModelConfig(encoder="attn", cell="lstm", social=True, head="gmm", num_heads=2),
    ModelConfig(encoder="attn", cell="gru", social=False, head="deterministic",
                num_heads=1, attn_layers=1),
]


@pytest.mark.parametrize("cfg", ATTN_CFGS, ids=["gmm-gru", "gmm-lstm", "det-nosocial"])
def test_loss_and_grads_finite(cfg, rng):
    model = Forecaster(cfg, OBS, PRED)
    params = model.init(jax.random.PRNGKey(0))
    xy, mask = _batch(rng)
    (loss, aux), grads = jax.value_and_grad(
        lambda p: model.loss(p, xy, mask, _stats()), has_aux=True
    )(params)
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    # every encoder parameter receives gradient (no dead sub-layer)
    enc_grads = jax.tree.leaves(grads["enc"])
    assert all(np.abs(np.asarray(g)).max() > 0 for g in enc_grads)


def test_rollout_shapes_and_finite(rng):
    cfg = ATTN_CFGS[0]
    model = Forecaster(cfg, OBS, PRED)
    params = model.init(jax.random.PRNGKey(0))
    xy, mask = _batch(rng)
    roll = model.rollout_k(params, xy[:, :, :OBS], mask, _stats(),
                           jax.random.PRNGKey(1), 4)
    assert roll.shape == (4, 2, 5, PRED, 2)
    assert np.isfinite(np.asarray(roll)).all()


def test_padding_invariance(rng):
    """Appending padded agents changes nothing for the valid ones — the
    temporal attention is per-agent and the GAT masks padded rows/cols."""
    cfg = ATTN_CFGS[0]
    model = Forecaster(cfg, OBS, PRED)
    params = model.init(jax.random.PRNGKey(0))
    xy, mask = _batch(rng, N=4)
    mask = jnp.ones_like(mask)  # all 4 valid
    pad = jnp.concatenate([xy, 777.0 * jnp.ones((2, 3, OBS + PRED, 2))], axis=1)
    pmask = jnp.concatenate([mask, jnp.zeros((2, 3), bool)], axis=1)

    loss_a, _ = model.loss(params, xy, mask, _stats())
    loss_b, _ = model.loss(params, pad, pmask, _stats())
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)

    # Rollout invariance at fixed N (the sample stream's shape depends on N,
    # exactly as in the RNN path — see test_rollout_padding_invariance):
    # perturbing a padded agent's trajectory must not move any valid agent.
    noise = jnp.asarray(rng.normal(size=pad.shape).astype(np.float32)) * 50
    pad2 = jnp.where(pmask[..., None, None], pad, pad + noise)
    r_a = model.rollout_k(params, pad[:, :, :OBS], pmask, _stats(), jax.random.PRNGKey(1), 3)
    r_b = model.rollout_k(params, pad2[:, :, :OBS], pmask, _stats(), jax.random.PRNGKey(1), 3)
    m = np.asarray(pmask)
    np.testing.assert_allclose(np.asarray(r_a)[:, m], np.asarray(r_b)[:, m], atol=1e-4)


def test_temporal_mhsa_causal(rng):
    """Output at step t is bit-independent of inputs at steps > t."""
    H, heads, T = 8, 2, 5
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    p = {
        "wq": jax.random.normal(ks[0], (H, H)) * 0.1,
        "wk": jax.random.normal(ks[1], (H, H)) * 0.1,
        "wv": jax.random.normal(ks[2], (H, H)) * 0.1,
        "wo": jax.random.normal(ks[3], (H, H)) * 0.1,
        "bo": jnp.zeros((H,)),
    }
    x = jnp.asarray(rng.normal(size=(1, 2, T, H)).astype(np.float32))
    y = _temporal_mhsa(p, x, heads)
    x2 = x.at[:, :, 3:].set(99.0)  # clobber the future
    y2 = _temporal_mhsa(p, x2, heads)
    np.testing.assert_array_equal(np.asarray(y[:, :, :3]), np.asarray(y2[:, :, :3]))
    assert np.abs(np.asarray(y[:, :, 3:]) - np.asarray(y2[:, :, 3:])).max() > 0


def test_remat_matches_no_remat(rng):
    """Every remat policy (attn layers checkpoint via the shared
    layers.maybe_remat) must be loss- and grad-equivalent to no remat."""
    cfg = ATTN_CFGS[0]
    model_n = Forecaster(dataclasses.replace(cfg, remat=False), OBS, PRED)
    params = model_n.init(jax.random.PRNGKey(0))
    xy, mask = _batch(rng)
    f = lambda m: jax.value_and_grad(  # noqa: E731
        lambda p: m.loss(p, xy, mask, _stats())[0]
    )(params)
    l_n, g_n = f(model_n)
    for policy in ("full", "dots", "dots_no_batch"):
        model_r = Forecaster(
            dataclasses.replace(cfg, remat=True, remat_policy=policy), OBS, PRED)
        l_r, g_r = f(model_r)
        np.testing.assert_allclose(float(l_r), float(l_n), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_n)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_variety_loss_composes(rng):
    cfg = ATTN_CFGS[0]
    model = Forecaster(cfg, OBS, PRED)
    params = model.init(jax.random.PRNGKey(0))
    xy, mask = _batch(rng)
    loss, grads = jax.value_and_grad(
        lambda p: model.loss_variety(p, xy, mask, _stats(), jax.random.PRNGKey(1), 4)
    )(params)
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_dropout_masks_apply(rng):
    """cfg.dropout > 0 + drop masks: finite loss, and the masked forward
    differs from the unmasked one (the masks actually reach the encoder)."""
    cfg = dataclasses.replace(ATTN_CFGS[0], dropout=0.5)
    model = Forecaster(cfg, OBS, PRED)
    params = model.init(jax.random.PRNGKey(0))
    xy, mask = _batch(rng)
    l_plain, _ = model.loss(params, xy, mask, _stats())
    l_drop, _ = model.loss(params, xy, mask, _stats(), key=jax.random.PRNGKey(7))
    assert np.isfinite(float(l_drop))
    assert abs(float(l_plain) - float(l_drop)) > 1e-9


def test_sinusoidal_positions_shapes():
    pe = sinusoidal_positions(8, 64)
    assert pe.shape == (8, 64) and bool(jnp.isfinite(pe).all())
    pe_odd = sinusoidal_positions(5, 7)  # odd width: last lane zero-padded
    assert pe_odd.shape == (5, 7)
    np.testing.assert_array_equal(np.asarray(pe_odd[:, -1]), 0.0)


def test_init_rejects_unknown_encoder():
    with pytest.raises(ValueError, match="unknown encoder"):
        Forecaster(ModelConfig(encoder="nope"), OBS, PRED).init(jax.random.PRNGKey(0))


def test_interop_guard(rng):
    """Reference-convention import/export is RNN-family-only; the attention
    encoder has no torch/Keras layout to mirror."""
    from mmtraj.interop import export_state_dict, import_state_dict

    cfg = ATTN_CFGS[0]
    params = Forecaster(cfg, OBS, PRED).init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="RNN encoder family"):
        export_state_dict(params, cfg)
    with pytest.raises(ValueError, match="RNN encoder family"):
        import_state_dict({}, cfg)


def test_bf16_compute_path(rng):
    cfg = dataclasses.replace(ATTN_CFGS[0], dtype="bfloat16")
    model = Forecaster(cfg, OBS, PRED)
    params = model.init(jax.random.PRNGKey(0))
    xy, mask = _batch(rng)
    loss, _ = model.loss(params, xy, mask, _stats())
    assert np.isfinite(float(loss))

"""Bivariate-Gaussian-mixture output head: params, NLL, sampling.

BASELINE.json:5/:9 — "the multimodal head emits bivariate-Gaussian mixture
parameters"; training minimizes the mixture NLL, prediction samples K=20
rollouts.  Numerical-stability rules (SURVEY.md §7 hard part 3): everything
here is computed in float32 regardless of the model compute dtype, sigma is
softplus-clamped from below, |rho| is tanh-bounded away from 1, and the
mixture reduction is a log-sum-exp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mmtraj.models.layers import Params, dense, dense_init

TWO_PI = 6.283185307179586


class GMMParams(NamedTuple):
    """Mixture of M bivariate Gaussians over a 2D offset; leading dims free."""

    logits: jnp.ndarray  # (..., M) unnormalized log mixture weights
    mu: jnp.ndarray  # (..., M, 2)
    sigma: jnp.ndarray  # (..., M, 2) positive
    rho: jnp.ndarray  # (..., M) in (-rho_max, rho_max)


def head_init(key, hidden: int, num_mixtures: int) -> Params:
    return dense_init(key, hidden, 6 * num_mixtures)


def head_apply(
    p: Params, h: jnp.ndarray, num_mixtures: int, sigma_min: float, rho_max: float
) -> GMMParams:
    """Hidden state (..., H) -> constrained GMMParams (float32)."""
    raw = dense(p, h).astype(jnp.float32)
    M = num_mixtures
    logits = raw[..., :M]
    mu = raw[..., M : 3 * M].reshape(raw.shape[:-1] + (M, 2))
    sigma = jax.nn.softplus(raw[..., 3 * M : 5 * M]) + sigma_min
    sigma = sigma.reshape(raw.shape[:-1] + (M, 2))
    rho = rho_max * jnp.tanh(raw[..., 5 * M :])
    return GMMParams(logits, mu, sigma, rho)


def nll(params: GMMParams, target: jnp.ndarray) -> jnp.ndarray:
    """Negative log-likelihood of target (..., 2) under the mixture -> (...).

    log N(x; mu, Sigma) for a bivariate Gaussian with correlation rho:
      -log(2 pi sx sy sqrt(1-rho^2)) - z / (2 (1-rho^2)),
      z = dx^2/sx^2 + dy^2/sy^2 - 2 rho dx dy / (sx sy).
    """
    x = target[..., None, :].astype(jnp.float32)  # (..., 1, 2)
    d = (x - params.mu) / params.sigma  # (..., M, 2)
    dx, dy = d[..., 0], d[..., 1]
    one_m_rho2 = jnp.maximum(1.0 - params.rho**2, 1e-6)
    z = dx * dx + dy * dy - 2.0 * params.rho * dx * dy
    log_norm = -jnp.log(
        TWO_PI * params.sigma[..., 0] * params.sigma[..., 1]
    ) - 0.5 * jnp.log(one_m_rho2)
    comp_logp = log_norm - z / (2.0 * one_m_rho2)  # (..., M)
    log_pi = jax.nn.log_softmax(params.logits, axis=-1)
    return -jax.scipy.special.logsumexp(log_pi + comp_logp, axis=-1)


def sample(params: GMMParams, key: jax.Array) -> jnp.ndarray:
    """Draw one offset (..., 2): categorical component, then correlated normal.

    Fully vectorized over leading dims; the K=20 rollout vmaps this over keys
    (BASELINE.json:5 "K-sample rollouts run fully vectorized via vmap").
    """
    k_comp, k_norm = jax.random.split(key)
    gumbel = jax.random.gumbel(k_comp, params.logits.shape, dtype=jnp.float32)
    z = jax.random.normal(k_norm, params.rho.shape[:-1] + (2,), dtype=jnp.float32)
    return sample_from(params, gumbel, z)


def sample_from(params: GMMParams, gumbel: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Sample consuming pre-drawn randoms: gumbel (..., M), z (..., 2) ~ N(0,1).

    Split out from `sample` so autoregressive rollouts can batch ALL their
    randoms into one threefry call outside the `lax.scan` (measured: per-step
    split+draw inside the scan was ~2x the whole rollout's runtime on v5e)
    and so the fused Pallas decoder (mmtraj/ops/fused_decoder.py) can consume
    the IDENTICAL stream, making kernel-vs-XLA equivalence testable exactly.
    """
    # Gumbel-max component choice expressed as a one-hot reduction: gathers
    # (take_along_axis) lower to TPU gather ops that measured ~150x slower
    # than the whole rest of the rollout step; one-hot einsum stays on the VPU.
    scores = params.logits + gumbel
    onehot = jax.nn.one_hot(
        jnp.argmax(scores, axis=-1), params.logits.shape[-1], dtype=jnp.float32
    )  # (..., M)
    mu = jnp.einsum("...m,...md->...d", onehot, params.mu)
    sigma = jnp.einsum("...m,...md->...d", onehot, params.sigma)
    rho = jnp.einsum("...m,...m->...", onehot, params.rho)
    dx = mu[..., 0] + sigma[..., 0] * z[..., 0]
    dy = mu[..., 1] + sigma[..., 1] * (
        rho * z[..., 0] + jnp.sqrt(jnp.maximum(1.0 - rho**2, 1e-6)) * z[..., 1]
    )
    return jnp.stack([dx, dy], axis=-1)


def mixture_mean(params: GMMParams) -> jnp.ndarray:
    """Probability-weighted mean offset (..., 2) — the deterministic decode."""
    pi = jax.nn.softmax(params.logits, axis=-1)
    return jnp.sum(pi[..., None] * params.mu, axis=-2)

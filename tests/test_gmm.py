"""GMM head: NLL vs scipy closed form, sampling statistics, constraints.

SURVEY.md §4: "GMM NLL vs scipy closed form"; §7 hard part 3 (stability).
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as sps

from mmtraj.models import gmm


def _random_params(rng, shape, M):
    return gmm.GMMParams(
        logits=jnp.asarray(rng.normal(size=shape + (M,)).astype(np.float32)),
        mu=jnp.asarray(rng.normal(size=shape + (M, 2)).astype(np.float32)),
        sigma=jnp.asarray((0.3 + rng.random(shape + (M, 2))).astype(np.float32)),
        rho=jnp.asarray((rng.random(shape + (M,)) * 1.6 - 0.8).astype(np.float32)),
    )


def test_nll_matches_scipy(rng):
    M = 3
    p = _random_params(rng, (5,), M)
    x = rng.normal(size=(5, 2)).astype(np.float32)
    got = np.asarray(gmm.nll(p, jnp.asarray(x)))
    logits = np.asarray(p.logits)
    pi = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    for i in range(5):
        like = 0.0
        for m in range(M):
            sx, sy = np.asarray(p.sigma)[i, m]
            r = np.asarray(p.rho)[i, m]
            cov = np.array([[sx**2, r * sx * sy], [r * sx * sy, sy**2]])
            like += pi[i, m] * sps.multivariate_normal.pdf(x[i], np.asarray(p.mu)[i, m], cov)
        np.testing.assert_allclose(got[i], -np.log(like), rtol=1e-4)


def test_head_apply_constraints(rng):
    key = jax.random.PRNGKey(1)
    p = gmm.head_init(key, 32, 5)
    h = jnp.asarray(rng.normal(size=(4, 7, 32)).astype(np.float32) * 10)
    out = gmm.head_apply(p, h, 5, sigma_min=1e-3, rho_max=0.99)
    assert out.logits.shape == (4, 7, 5)
    assert out.mu.shape == (4, 7, 5, 2)
    assert (np.asarray(out.sigma) >= 1e-3).all()
    assert (np.abs(np.asarray(out.rho)) <= 0.99).all()


def test_sample_statistics():
    """Single tight component: samples concentrate on mu with given cov."""
    mu = np.array([1.5, -2.0], np.float32)
    sx, sy, r = 0.5, 0.25, 0.6
    p = gmm.GMMParams(
        logits=jnp.zeros((1, 1)),
        mu=jnp.asarray(mu)[None, None],
        sigma=jnp.asarray([[[sx, sy]]]),
        rho=jnp.asarray([[r]]),
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 20000)
    samples = np.asarray(jax.vmap(lambda k: gmm.sample(p, k))(keys))[:, 0]
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.02)
    cov = np.cov(samples.T)
    np.testing.assert_allclose(cov[0, 0], sx**2, rtol=0.1)
    np.testing.assert_allclose(cov[1, 1], sy**2, rtol=0.1)
    np.testing.assert_allclose(cov[0, 1], r * sx * sy, rtol=0.15)


def test_sample_respects_mixture_weights():
    """Two far-apart components with 80/20 weights."""
    p = gmm.GMMParams(
        logits=jnp.log(jnp.asarray([[0.8, 0.2]])),
        mu=jnp.asarray([[[-10.0, 0.0], [10.0, 0.0]]]),
        sigma=jnp.full((1, 2, 2), 0.1),
        rho=jnp.zeros((1, 2)),
    )
    keys = jax.random.split(jax.random.PRNGKey(2), 5000)
    samples = np.asarray(jax.vmap(lambda k: gmm.sample(p, k))(keys))[:, 0]
    frac_left = (samples[:, 0] < 0).mean()
    np.testing.assert_allclose(frac_left, 0.8, atol=0.03)


def test_mixture_mean():
    p = gmm.GMMParams(
        logits=jnp.log(jnp.asarray([[0.25, 0.75]])),
        mu=jnp.asarray([[[0.0, 0.0], [4.0, -4.0]]]),
        sigma=jnp.ones((1, 2, 2)),
        rho=jnp.zeros((1, 2)),
    )
    np.testing.assert_allclose(np.asarray(gmm.mixture_mean(p))[0], [3.0, -3.0], atol=1e-4)


def test_nll_gradient_finite_extreme_targets(rng):
    """Stability: far-out targets and tiny sigmas must not NaN the grad."""
    p = _random_params(rng, (3,), 2)
    x = jnp.asarray(np.array([[50.0, -50.0], [0, 0], [1e3, 1e3]], np.float32))
    g = jax.grad(lambda pp: gmm.nll(pp, x).sum())(p)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()

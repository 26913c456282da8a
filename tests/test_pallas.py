"""Fused Pallas GAT kernel: equivalence vs the canonical XLA path.

SURVEY.md §7 hard part 5: the kernel is an opt-in accelerator; these tests
pin it to `gat_math` (forward) and to XLA autodiff (backward).  On CPU the
kernel runs in interpret mode; the same tests run compiled on real TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtraj.config import ModelConfig
from mmtraj.data.transforms import NormStats
from mmtraj.graph.adjacency import proximity_adjacency
from mmtraj.models.forecaster import Forecaster
from mmtraj.models.gat import gat_apply, gat_init
from mmtraj.ops.fused_gat import fused_gat, gat_math


pytestmark = pytest.mark.slow  # scan-heavy; quick subset: -m "not slow"


def _inputs(rng, B=3, N=8, D=16, heads=4):
    params = gat_init(jax.random.PRNGKey(0), D, D, heads)
    h = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    xy = jnp.asarray((rng.normal(size=(B, N, 2)) * 2).astype(np.float32))
    mask = jnp.asarray(rng.random((B, N)) > 0.25)
    adj = proximity_adjacency(xy, mask, radius=3.0)
    eye = jnp.eye(N, dtype=bool)
    attend = (adj | (eye[None] & mask[:, None, :] & mask[:, :, None])).astype(jnp.float32)
    return params, h, attend, mask, adj


@pytest.mark.parametrize("heads", [1, 2, 4])
def test_forward_equivalence(rng, heads):
    params, h, attend, _, _ = _inputs(rng, heads=heads)
    ref = gat_math(h, attend, params["wv"], params["a_src"], params["a_dst"],
                   params["wo"], params["bo"], heads)
    got = fused_gat(h, attend, params["wv"], params["a_src"], params["a_dst"],
                    params["wo"], params["bo"], heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_gradient_equivalence(rng):
    params, h, attend, _, _ = _inputs(rng)

    def loss_ref(h_, wv):
        return jnp.sum(
            gat_math(h_, attend, wv, params["a_src"], params["a_dst"],
                     params["wo"], params["bo"], 4) ** 2
        )

    def loss_fused(h_, wv):
        return jnp.sum(
            fused_gat(h_, attend, wv, params["a_src"], params["a_dst"],
                      params["wo"], params["bo"], 4) ** 2
        )

    g1h, g1w = jax.grad(loss_ref, argnums=(0, 1))(h, params["wv"])
    g2h, g2w = jax.grad(loss_fused, argnums=(0, 1))(h, params["wv"])
    np.testing.assert_allclose(np.asarray(g1h), np.asarray(g2h), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1w), np.asarray(g2w), atol=1e-4, rtol=1e-4)


def test_gat_apply_pallas_path_matches(rng):
    params, h, _, mask, adj = _inputs(rng)
    a = gat_apply(params, h, adj, mask, 4, use_pallas=False)
    b = gat_apply(params, h, adj, mask, 4, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_fused_gat_under_vmap(rng):
    """vmap over a leading (K-samples) axis — how the rollout uses it."""
    params, h, attend, _, _ = _inputs(rng)
    hk = jnp.stack([h, h * 0.5, -h])

    def f(hh):
        return fused_gat(hh, attend, params["wv"], params["a_src"], params["a_dst"],
                         params["wo"], params["bo"], 4)

    got = jax.vmap(f)(hk)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(f(hk[i])), atol=1e-5, rtol=1e-5
        )


def test_forecaster_pallas_loss_matches_xla(rng):
    cfg_x = ModelConfig(social=True, num_heads=4, use_pallas=False)
    cfg_p = ModelConfig(social=True, num_heads=4, use_pallas=True)
    mx = Forecaster(cfg_x, 8, 12)
    mp = Forecaster(cfg_p, 8, 12)
    params = mx.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.ones(2, np.float32))
    steps = rng.normal(size=(2, 6, 20, 2)).astype(np.float32) * 0.3
    xy = jnp.asarray(np.cumsum(steps, axis=2))
    mask = jnp.asarray(rng.random((2, 6)) > 0.2)
    l1, _ = mx.loss(params, xy, mask, stats)
    l2, _ = mp.loss(params, xy, mask, stats)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


class TestFusedAttend:
    """Score+softmax+aggregate kernel (mmtraj/ops/fused_attend.py):
    forward exact vs the XLA reference chain, backward = XLA autodiff."""

    def _inputs(self, B=12, N=64, H=4, dh=16, seed=0):
        rng = np.random.default_rng(seed)
        v = jnp.asarray(rng.normal(size=(B, N, H * dh)).astype(np.float32))
        ss = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
        sd = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
        att = jnp.asarray((rng.random((B, N, N)) < 0.4).astype(np.float32))
        att = jnp.maximum(att, jnp.eye(N)[None])
        return v, ss, sd, att

    def test_forward_exact(self):
        from mmtraj.ops.fused_attend import attend_math, attend_pallas

        v, ss, sd, att = self._inputs()
        ref = attend_math(v, ss, sd, att, 4)
        ker = attend_pallas(v, ss, sd, att, 4, 8)
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=1e-5)

    def test_forward_exact_nonmultiple_batch(self):
        """B not divisible by group -> internal padding must not leak."""
        from mmtraj.ops.fused_attend import attend_math, attend_pallas

        v, ss, sd, att = self._inputs(B=11)
        ref = attend_math(v, ss, sd, att, 4)
        ker = attend_pallas(v, ss, sd, att, 4, 8)
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=1e-5)

    def test_zero_row_emits_zeros(self):
        from mmtraj.ops.fused_attend import attend_pallas

        v, ss, sd, att = self._inputs(B=8)
        att = att.at[0, 3].set(0.0)
        out = attend_pallas(v, ss, sd, att, 4, 8)
        np.testing.assert_allclose(np.asarray(out)[0, 3], 0.0, atol=1e-6)

    def test_packed_forward_exact(self):
        """Lane-packed variant (two graphs per 128-lane tile): exact vs the
        reference chain, including internal pad (B not divisible by group)
        and an all-masked row."""
        from mmtraj.ops.fused_attend import attend_math, attend_pallas

        for B in (12, 11):
            v, ss, sd, att = self._inputs(B=B)
            att = att.at[0, 3].set(0.0)
            ref = attend_math(v, ss, sd, att, 4)
            ker = attend_pallas(v, ss, sd, att, 4, 8, True)
            np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                                       atol=1e-5)

    def test_packed_requires_even_group(self):
        from mmtraj.ops.fused_attend import attend_pallas

        v, ss, sd, att = self._inputs(B=6)
        with pytest.raises(ValueError, match="even group"):
            attend_pallas(v, ss, sd, att, 4, 3, True)

    def test_gradients_match_reference(self):
        from mmtraj.ops.fused_attend import attend_math, attend_pallas

        v, ss, sd, att = self._inputs(B=8, N=16)

        def loss_k(vv, s1, s2):
            return (attend_pallas(vv, s1, s2, att, 4, 8) ** 2).sum()

        def loss_r(vv, s1, s2):
            return (attend_math(vv, s1, s2, att, 4) ** 2).sum()

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(v, ss, sd)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(v, ss, sd)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)

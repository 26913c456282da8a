"""GAT layer tests: shapes, masking/padding invariance, gradient isolation.

SURVEY.md §4: "padded agents never affect real agents' outputs/gradients" —
the classic silent-wrongness source for padded graphs (§7 hard part 2).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mmtraj.graph.adjacency import proximity_adjacency
from mmtraj.models.gat import gat_apply, gat_init
from mmtraj.models.layers import masked_softmax


def _setup(rng, B=2, N=6, D=16, heads=4):
    key = jax.random.PRNGKey(0)
    params = gat_init(key, D, D, heads)
    h = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    xy = jnp.asarray((rng.normal(size=(B, N, 2)) * 2).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0]], bool)[:B, :N])
    return params, h, xy, mask


def test_masked_softmax_zero_rows():
    logits = jnp.zeros((2, 3))
    mask = jnp.array([[True, False, True], [False, False, False]])
    out = masked_softmax(logits, mask)
    np.testing.assert_allclose(np.asarray(out[0]), [0.5, 0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), 0.0)  # no NaN on empty rows


def test_gat_shapes(rng):
    params, h, xy, mask = _setup(rng)
    adj = proximity_adjacency(xy, mask, radius=-1.0)
    out = gat_apply(params, h, adj, mask, num_heads=4)
    assert out.shape == h.shape
    assert np.isfinite(np.asarray(out)).all()


def test_gat_padding_invariance(rng):
    """Perturbing padded agents' features/positions must not change valid outputs."""
    params, h, xy, mask = _setup(rng)
    adj = proximity_adjacency(xy, mask, radius=-1.0)
    out1 = gat_apply(params, h, adj, mask, num_heads=4)

    noise_h = jnp.asarray(rng.normal(size=h.shape).astype(np.float32))
    noise_xy = jnp.asarray(rng.normal(size=xy.shape).astype(np.float32))
    h2 = jnp.where(mask[..., None], h, h + 100.0 * noise_h)
    xy2 = jnp.where(mask[..., None], xy, xy + 100.0 * noise_xy)
    adj2 = proximity_adjacency(xy2, mask, radius=-1.0)
    out2 = gat_apply(params, h2, adj2, mask, num_heads=4)

    np.testing.assert_allclose(
        np.asarray(out1)[np.asarray(mask)], np.asarray(out2)[np.asarray(mask)], atol=1e-5
    )
    # padded rows are exactly zero
    np.testing.assert_allclose(np.asarray(out2)[~np.asarray(mask)], 0.0)


def test_gat_gradient_isolation(rng):
    """d(valid outputs)/d(padded inputs) == 0."""
    params, h, xy, mask = _setup(rng)
    adj = proximity_adjacency(xy, mask, radius=-1.0)

    def valid_sum(hh):
        out = gat_apply(params, hh, adj, mask, num_heads=4)
        return jnp.sum(jnp.where(mask[..., None], out, 0.0))

    g = np.asarray(jax.grad(valid_sum)(h))
    np.testing.assert_allclose(g[~np.asarray(mask)], 0.0, atol=1e-6)


def test_gat_isolated_agent_self_attends(rng):
    """A valid agent with no neighbors in radius still gets nonzero output."""
    params, h, _, _ = _setup(rng, B=1, N=6)
    xy = jnp.asarray(
        np.array([[[0, 0], [100, 100], [101, 100], [200, 0], [0, 200], [50, 50]]], np.float32)
    )
    mask = jnp.ones((1, 6), bool)
    adj = proximity_adjacency(xy, mask, radius=4.0)
    assert not np.asarray(adj)[0, 0].any()  # agent 0 isolated
    out = gat_apply(params, h, adj, mask, num_heads=4)
    assert np.abs(np.asarray(out[0, 0])).sum() > 0


def test_attend_kernel_dispatch_and_equivalence(rng):
    """attend_kernel="pallas" (interpret mode on CPU) must match the XLA
    chain through gat_apply; "auto" on CPU must BE the XLA chain exactly
    (dispatch requires a TPU backend); bad values rejected."""
    import pytest

    B, N, D, H = 3, 8, 16, 2
    p = gat_init(jax.random.PRNGKey(0), D, D, H)
    h = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    xy = jnp.asarray(rng.normal(size=(B, N, 2)).astype(np.float32) * 2)
    mask = jnp.asarray(rng.random((B, N)) > 0.25)
    adj = proximity_adjacency(xy, mask, 3.0)

    out_xla = gat_apply(p, h, adj, mask, H, attend_kernel="xla")
    out_auto = gat_apply(p, h, adj, mask, H, attend_kernel="auto")
    out_pal = gat_apply(p, h, adj, mask, H, attend_kernel="pallas")
    np.testing.assert_array_equal(np.asarray(out_xla), np.asarray(out_auto))
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_pal),
                               atol=2e-5, rtol=1e-5)
    with pytest.raises(ValueError, match="attend_kernel"):
        gat_apply(p, h, adj, mask, H, attend_kernel="cuda")


def test_attend_dispatch_rule_is_inference_only(monkeypatch):
    """"auto" engages the kernel only at N>=128 on TPU on NON-train paths
    (train_bench A/B: the grad program is 13-14% slower through the kernel
    at dense N — ARCHITECTURE.md pt 13); explicit pins apply everywhere."""
    import jax as _jax

    from mmtraj.models.gat import _use_attend_kernel

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    assert _use_attend_kernel("auto", False, 128, train=False)
    assert not _use_attend_kernel("auto", False, 128, train=True)
    assert not _use_attend_kernel("auto", False, 64, train=False)
    assert _use_attend_kernel("pallas", False, 64, train=True)  # pin wins
    assert not _use_attend_kernel("xla", False, 256, train=False)
    assert not _use_attend_kernel("auto", True, 256, train=False)  # fused-GAT path
    monkeypatch.setattr(_jax, "default_backend", lambda: "cpu")
    assert not _use_attend_kernel("auto", False, 256, train=False)


def test_attend_kernel_grads_match(rng):
    """The pallas attend path's custom_vjp backward (XLA autodiff of the
    identical math) must match the canonical chain's gradients."""
    B, N, D, H = 2, 8, 16, 2
    p = gat_init(jax.random.PRNGKey(1), D, D, H)
    h = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    xy = jnp.asarray(rng.normal(size=(B, N, 2)).astype(np.float32) * 2)
    mask = jnp.asarray(np.ones((B, N), bool))
    adj = proximity_adjacency(xy, mask, 3.0)

    def loss(params, kernel):
        return (gat_apply(params, h, adj, mask, H, attend_kernel=kernel) ** 2).sum()

    g_x = jax.grad(lambda q: loss(q, "xla"))(p)
    g_p = jax.grad(lambda q: loss(q, "pallas"))(p)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_attend_group_budget():
    """Group sizing matches the measured compile envelope: G=8 fits at
    N<=128, N=256 must drop to 4 (G=8 fails to compile there)."""
    from mmtraj.models.gat import _attend_group

    assert _attend_group(64, 4, 16) == 8
    assert _attend_group(128, 4, 16) == 8
    assert _attend_group(256, 4, 16) == 4
    assert _attend_group(512, 4, 16) == 1

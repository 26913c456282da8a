"""Minimal pure-JAX parameter/layer toolkit.

The model stack is deliberately module-system-free: parameters are plain
nested dicts of jnp arrays, apply functions are pure.  This keeps every
component trivially compatible with jit / lax.scan / vmap / shard_map and lets
the Pallas kernels (mmtraj/ops) consume raw weight matrices directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Params = dict

NEG_INF = -1e9


def maybe_remat(cfg, body):
    """Wrap a scan/layer body in jax.checkpoint per cfg.remat/remat_policy.

    Policies change scheduling (what the backward pass recomputes vs reads
    from HBM), never math — pinned by tests/test_models.py::
    test_remat_matches_no_remat for every policy."""
    if not cfg.remat:
        return body
    if cfg.remat_policy == "full":
        return jax.checkpoint(body)
    policy = {
        "dots": jax.checkpoint_policies.dots_saveable,
        "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }.get(cfg.remat_policy)
    if policy is None:
        raise ValueError(f"unknown remat_policy {cfg.remat_policy!r}")
    return jax.checkpoint(body, policy=policy)


def glorot(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    scale = jnp.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(key, shape, dtype) * scale


def dense_init(key, din: int, dout: int) -> Params:
    return {"w": glorot(key, (din, dout)), "b": jnp.zeros((dout,), jnp.float32)}


def dense(p: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    w, b = p["w"], p["b"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32) + b


def mlp_init(key, dims) -> Params:
    keys = jax.random.split(key, len(dims) - 1)
    return {f"l{i}": dense_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)}


def mlp(p: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    n = len(p)
    for i in range(n):
        x = dense(p[f"l{i}"], x, dtype)
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over the last axis, statistics in float32 (same rationale as
    the GMM head: TPU bf16 matmuls are fine, normalization statistics are
    not — SURVEY.md §7 hard part 3)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax over `axis` treating mask==False entries as absent.

    Rows with zero valid entries return all-zeros (not NaN) — the classic
    padded-graph silent-wrongness source (SURVEY.md §7 hard part 2).
    """
    logits = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(logits, axis=axis, keepdims=True)
    e = jnp.exp(logits - jax.lax.stop_gradient(m)) * mask
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-20)

"""Spatio-temporal attention encoder — the second encoder family.

The reference family encodes observations with an RNN over per-step offsets
plus per-frame social GAT refinement (BASELINE.json:5; the `encoder="rnn"`
path in mmtraj/models/forecaster.py).  This module is the attention-native
alternative (`ModelConfig.encoder="attn"`): the successor literature to the
reference's Social-LSTM/GAT lineage (STAR, AgentFormer) replaces the
recurrence with interleaved temporal and spatial attention, and on TPU that
trades the RNN's 8 inherently sequential tiny-matmul steps — the measured
latency ceiling of the whole pipeline (ARCHITECTURE.md pt 9: ~2% MFU, time
dominated by `while`-loop latency, not FLOPs) — for a handful of large
batched matmuls with NO sequential dependency over time, which is exactly
the shape the MXU wants.

Per layer (pre-LN transformer block, L = cfg.attn_layers):

1. **Temporal self-attention, per agent**: multi-head attention over the
   To observation steps of each agent independently, causally masked.  All
   (B, N) agent rows batch into one attention call — (B·N, To, H) operands.
2. **Social attention, per frame** (when cfg.social): the same masked
   multi-head GAT the RNN path uses (mmtraj/models/gat.py), applied to every
   frame at once by folding time into the batch axis — (B·To, N, H) — over
   the per-frame proximity adjacency.  The two sub-layers factorize full
   spatio-temporal attention the way the reference's per-frame graphs +
   recurrence do, at fixed shapes.
3. **Position-wise MLP** (H -> 4H -> H).

Positions are injected with the standard parameter-free sinusoidal encoding
(any obs_len works without re-initializing), the readout is the final
observation step's representation (causality makes it a function of the whole
window), and the decoder side of the forecaster — autoregressive GRU/LSTM +
GMM head + sampled rollouts — is unchanged, so every eval protocol, loss
(NLL/variety/hybrid), export, and serving path composes with this encoder
untouched.

Everything is fixed-shape and mask-correct: padded agents only ever attend to
themselves (temporal attention is per-agent; the GAT masks padded rows/cols),
pinned by the padding-invariance tests in tests/test_attn_encoder.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mmtraj.graph.adjacency import proximity_adjacency
from mmtraj.models.gat import gat_apply, gat_init
from mmtraj.models.layers import (
    NEG_INF,
    Params,
    dense,
    dense_init,
    glorot,
    layer_norm,
    layer_norm_init,
    maybe_remat,
    mlp,
    mlp_init,
)


def attn_encoder_init(key: jax.Array, cfg) -> Params:
    """Parameters for the spatio-temporal attention encoder.

    Structure: embed (2->E) -> proj (E->H) -> L x {ln1, attn, [ln2, gat],
    ln3, mlp} -> ln_out.  The embed stays at cfg.embed_dim so the trainer's
    variational-dropout masks (drawn at embed_dim/hidden_dim) apply to both
    encoder families identically.
    """
    E, H, L = cfg.embed_dim, cfg.hidden_dim, cfg.attn_layers
    assert H % cfg.num_heads == 0, "num_heads must divide hidden_dim"
    keys = jax.random.split(key, 2 + L)
    params: Params = {
        "embed": dense_init(keys[0], 2, E),
        "proj": dense_init(keys[1], E, H),
        "ln_out": layer_norm_init(H),
        "layers": {},
    }
    for i in range(L):
        ks = jax.random.split(keys[2 + i], 6)
        layer: Params = {
            "ln1": layer_norm_init(H),
            "attn": {
                "wq": glorot(ks[0], (H, H)),
                "wk": glorot(ks[1], (H, H)),
                "wv": glorot(ks[2], (H, H)),
                "wo": glorot(ks[3], (H, H)),
                "bo": jnp.zeros((H,), jnp.float32),
            },
            "ln3": layer_norm_init(H),
            "mlp": mlp_init(ks[4], (H, 4 * H, H)),
        }
        if cfg.social:
            layer["ln2"] = layer_norm_init(H)
            layer["gat"] = gat_init(ks[5], H, H, cfg.num_heads)
        params["layers"][f"l{i}"] = layer
    return params


def sinusoidal_positions(T: int, H: int) -> jnp.ndarray:
    """(T, H) parameter-free sinusoidal positional encoding (float32)."""
    pos = jnp.arange(T, dtype=jnp.float32)[:, None]
    dim = jnp.arange(H // 2, dtype=jnp.float32)[None, :]
    angle = pos / jnp.power(10000.0, 2.0 * dim / H)
    pe = jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=-1)
    if pe.shape[-1] < H:  # odd H: pad the last lane
        pe = jnp.pad(pe, ((0, 0), (0, H - pe.shape[-1])))
    return pe


def _temporal_mhsa(p: Params, x: jnp.ndarray, num_heads: int, dtype=None) -> jnp.ndarray:
    """Causal multi-head self-attention over the time axis, per agent.

    x (B, N, T, H) -> (B, N, T, H).  Every agent row is an independent
    sequence; scores/softmax run in float32 (matmul operands may be bf16 via
    ``dtype``).  Causal masking keeps step t a function of steps <= t, so the
    last-step readout summarizes the whole window and no future-frame
    information leaks — matching the RNN encoder's semantics.
    """
    B, N, T, H = x.shape
    dh = H // num_heads
    xin = x.astype(dtype) if dtype is not None else x
    cast = lambda w: w.astype(dtype) if dtype is not None else w  # noqa: E731
    split = lambda a: a.reshape(B, N, T, num_heads, dh)  # noqa: E731
    q = split(jnp.dot(xin, cast(p["wq"]), preferred_element_type=jnp.float32))
    k = split(jnp.dot(xin, cast(p["wk"]), preferred_element_type=jnp.float32))
    v = split(jnp.dot(xin, cast(p["wv"]), preferred_element_type=jnp.float32))
    scores = jnp.einsum("bnthd,bnshd->bnhts", q, k) / jnp.sqrt(jnp.float32(dh))
    causal = jnp.tril(jnp.ones((T, T), bool))
    scores = jnp.where(causal, scores, NEG_INF)
    alpha = jax.nn.softmax(scores, axis=-1)  # rows always have >=1 valid (self)
    out = jnp.einsum("bnhts,bnshd->bnthd", alpha, v).reshape(B, N, T, H)
    return jnp.dot(out.astype(xin.dtype), cast(p["wo"]),
                   preferred_element_type=jnp.float32) + p["bo"]


def attn_encode(params: Params, cfg, xy_obs, dxy_n, mask, drop=None,
                train: bool = False, compute_dtype=None) -> jnp.ndarray:
    """Encode an observation window -> (B, N, H) last-step features.

    xy_obs (B, N, To, 2) absolute meters (drives the per-frame proximity
    graphs), dxy_n (B, N, To, 2) normalized offsets (the content stream —
    same inputs the RNN encoder consumes), mask (B, N) validity.

    ``drop``: the forecaster's variational-dropout masks {"emb": (B, N, E),
    "gat": (B, N, H)}, broadcast over time (one mask per window, Gal &
    Ghahramani — identical semantics to the RNN path).  ``train`` marks the
    differentiated path for the GAT's attend-kernel dispatch.

    The caller (Forecaster.encode) bridges the returned features into the
    decoder carry exactly as it bridges the RNN final state.
    """
    dt = compute_dtype
    B, N, T, _ = xy_obs.shape
    x = jax.nn.relu(dense(params["embed"], dxy_n, dt))  # (B, N, T, E)
    if drop is not None:
        x = x * drop["emb"][:, :, None, :]
    x = dense(params["proj"], x, dt)  # (B, N, T, H)
    x = x + sinusoidal_positions(T, x.shape[-1])

    adj_flat = mask_flat = None
    if cfg.social:
        # One adjacency per frame, all frames at once: fold T into batch.
        xy_flat = jnp.moveaxis(xy_obs, 2, 1).reshape(B * T, N, 2)
        mask_flat = jnp.broadcast_to(mask[:, None, :], (B, T, N)).reshape(B * T, N)
        adj_flat = proximity_adjacency(xy_flat, mask_flat, cfg.adjacency_radius)

    def layer_apply(lp, x):
        y = _temporal_mhsa(lp["attn"], layer_norm(lp["ln1"], x), cfg.num_heads, dt)
        x = x + y
        if cfg.social:
            y = layer_norm(lp["ln2"], x)
            y_flat = jnp.moveaxis(y, 2, 1).reshape(B * T, N, -1)
            g = gat_apply(
                lp["gat"], y_flat, adj_flat, mask_flat, cfg.num_heads, dt,
                use_pallas=cfg.use_pallas, attend_kernel=cfg.attend_kernel,
                train=train,
            )
            g = jnp.moveaxis(g.reshape(B, T, N, -1), 1, 2)  # (B, N, T, H)
            if drop is not None:
                g = g * drop["gat"][:, :, None, :]
            x = x + g
        x = x + mlp(lp["mlp"], layer_norm(lp["ln3"], x), dt)
        return x

    layer_apply = maybe_remat(cfg, layer_apply)
    for i in range(cfg.attn_layers):
        x = layer_apply(params["layers"][f"l{i}"], x)
    feat = layer_norm(params["ln_out"], x[:, :, -1])  # (B, N, H) last obs step
    return jnp.where(mask[..., None], feat, 0.0).astype(jnp.float32)

"""Masked multi-head graph attention over padded fixed-shape social graphs.

GAT-style attention (additive scores with LeakyReLU) over the per-frame
proximity adjacency (BASELINE.json:5 "graph-attention message passing";
:10 "multi-head graph attention over dense crowds").  Operates on (B, N, D)
with a bool adjacency (B, N, N); padding rows/cols contribute nothing to any
valid agent's output or gradient (tested by padding-invariance unit tests,
SURVEY.md §4).

Self-loops are added internally for valid agents so isolated pedestrians
attend to themselves instead of emitting zeros.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mmtraj.models.layers import Params, glorot, masked_softmax


def gat_init(key, din: int, dout: int, num_heads: int) -> Params:
    assert dout % num_heads == 0, "dout must divide num_heads"
    dh = dout // num_heads
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "wv": glorot(k1, (din, num_heads * dh)),
        "a_src": glorot(k2, (num_heads, dh)),
        "a_dst": glorot(k3, (num_heads, dh)),
        "wo": glorot(k4, (num_heads * dh, dout)),
        "bo": jnp.zeros((dout,), jnp.float32),
    }


def gat_apply(
    p: Params,
    h: jnp.ndarray,
    adj: jnp.ndarray,
    mask: jnp.ndarray,
    num_heads: int,
    dtype=None,
) -> jnp.ndarray:
    """h (B, N, D), adj (B, N, N) bool, mask (B, N) bool -> (B, N, dout).

    score_ij = LeakyReLU(a_src . v_i + a_dst . v_j); alpha = masked softmax
    over neighbors j (self-loop included for valid i); out_i = Wo [concat_h
    sum_j alpha_ij v_j].
    """
    B, N, _ = h.shape
    wv = p["wv"]
    hin = h
    if dtype is not None:
        hin, wv = hin.astype(dtype), wv.astype(dtype)
    v = jnp.dot(hin, wv, preferred_element_type=jnp.float32)  # (B, N, H*dh)
    v = v.reshape(B, N, num_heads, -1)  # (B, N, H, dh)

    s_src = jnp.einsum("bnhd,hd->bnh", v, p["a_src"])  # (B, N, H)
    s_dst = jnp.einsum("bnhd,hd->bnh", v, p["a_dst"])
    logits = jax.nn.leaky_relu(
        s_src[:, :, None, :] + s_dst[:, None, :, :], negative_slope=0.2
    )  # (B, N_recv, N_send, H)

    eye = jnp.eye(N, dtype=bool)
    attend = adj | (eye[None] & mask[:, None, :] & mask[:, :, None])  # (B, N, N)
    alpha = masked_softmax(logits, attend[..., None], axis=2)  # (B, N, N, H)

    out = jnp.einsum("bnmh,bmhd->bnhd", alpha, v)  # (B, N, H, dh)
    out = out.reshape(B, N, -1)
    wo = p["wo"]
    if dtype is not None:
        out, wo = out.astype(dtype), wo.astype(dtype)
    out = jnp.dot(out, wo, preferred_element_type=jnp.float32) + p["bo"]
    return jnp.where(mask[..., None], out, 0.0)

"""Fused-gate GRU/LSTM cells as pure functions.

Recurrence compiles to `jax.lax.scan` with all gates computed by ONE pair of
matmuls per step (input and recurrent), the exact "small per-agent matmuls"
that BASELINE.json:5 marks as the Pallas fusion target; keeping the weights as
raw (din, 3H/4H) matrices lets mmtraj/ops swap in fused kernels without a
module-system detour.

Conventions: GRU h' = (1-z)*n + z*h (torch convention); LSTM carry is (c, h).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mmtraj.models.layers import Params, glorot


class Carry(NamedTuple):
    """Recurrent state; c is all-zeros and unused for GRU."""

    h: jnp.ndarray
    c: jnp.ndarray


def cell_init(key, kind: str, din: int, hidden: int) -> Params:
    g = 3 if kind == "gru" else 4
    k1, k2 = jax.random.split(key)
    return {
        "wx": glorot(k1, (din, g * hidden)),
        "wh": glorot(k2, (hidden, g * hidden)),
        "b": jnp.zeros((g * hidden,), jnp.float32),
    }


def init_carry(batch_shape: Tuple[int, ...], hidden: int, dtype=jnp.float32) -> Carry:
    z = jnp.zeros(batch_shape + (hidden,), dtype)
    return Carry(h=z, c=z)


def cell_apply(p: Params, kind: str, x: jnp.ndarray, carry: Carry, dtype=None) -> Carry:
    wx, wh = p["wx"], p["wh"]
    h, c = carry.h, carry.c
    if dtype is not None:
        x, wx = x.astype(dtype), wx.astype(dtype)
        hcast, wh = h.astype(dtype), wh.astype(dtype)
    else:
        hcast = h
    xg = jnp.dot(x, wx, preferred_element_type=jnp.float32) + p["b"]
    hg = jnp.dot(hcast, wh, preferred_element_type=jnp.float32)
    # Optional recurrent bias: absent from cell_init (fused into "b" there),
    # but required for EXACT import of torch- and Keras(reset_after=True)-
    # convention checkpoints, whose GRU applies the recurrent n-gate bias
    # inside the reset multiplication
    # (n = tanh(Wxn x + b_in + r * (Whn h + b_hn))) — see mmtraj/interop.py.
    if "bh" in p:
        hg = hg + p["bh"]
    hid = h.shape[-1]
    if kind == "gru":
        if "wh_n" in p:
            # Keras reset_after=False convention: the reset gate multiplies
            # the HIDDEN STATE before the candidate matmul —
            # n = tanh(Wxn x + b_n + (r*h) Whn).  Present only on imported
            # params (mmtraj/interop.py); "wh" then covers z,r (H, 2H) and
            # "wh_n" is the candidate recurrent matrix (H, H).
            z = jax.nn.sigmoid(xg[..., :hid] + hg[..., :hid])
            r = jax.nn.sigmoid(xg[..., hid : 2 * hid] + hg[..., hid : 2 * hid])
            wh_n = p["wh_n"].astype(dtype) if dtype is not None else p["wh_n"]
            hn = jnp.dot(r.astype(wh_n.dtype) * hcast, wh_n,
                         preferred_element_type=jnp.float32)
            n = jnp.tanh(xg[..., 2 * hid :] + hn)
            return Carry(h=(1.0 - z) * n + z * h, c=carry.c)
        # CuDNN-style gating: n = tanh(x Wxn + b_n + r * (h Whn)).
        z = jax.nn.sigmoid(xg[..., :hid] + hg[..., :hid])
        r = jax.nn.sigmoid(xg[..., hid : 2 * hid] + hg[..., hid : 2 * hid])
        n = jnp.tanh(xg[..., 2 * hid :] + r * hg[..., 2 * hid :])
        h_new = (1.0 - z) * n + z * h
        return Carry(h=h_new, c=carry.c)
    elif kind == "lstm":
        i, f, g, o = jnp.split(xg + hg, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f + 1.0), jax.nn.sigmoid(o)
        c_new = f * c + i * jnp.tanh(g)
        h_new = o * jnp.tanh(c_new)
        return Carry(h=h_new, c=c_new)
    raise ValueError(f"unknown cell kind {kind!r}")

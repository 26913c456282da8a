"""Pallas TPU kernel for the GAT score+softmax+aggregate chain ONLY.

Round-1 profiling (ARCHITECTURE.md "What profiling rules out") showed the
rollout's residual time is XLA layout copies around the 4 per-head
``(B*K, N, N)`` attention bmms plus the softmax chain — ~300us of each
~790us decoder step at the flagship shape.  Whole-layer / whole-rollout
Pallas fusion loses end-to-end (measured 85k / 53k vs 106k rollouts/s:
Mosaic codegen for the small dense projections is slower than XLA's), so
this kernel takes the OPPOSITE cut: XLA keeps every dense matmul (value
projection, score projections, output projection — all well-batched MXU
shapes), and the kernel fuses just the per-head chain

    logits_ij = LeakyReLU(s_src_i + s_dst_j)  -> masked softmax over j
    agg_i     = concat_h( alpha^h @ v^h )

so every (G, N, N) intermediate lives in VMEM and the inter-op HBM layout
copies disappear.

Aggregation trick: instead of H small ``(N,N)@(N,dh)`` matmuls (dh=16 lanes —
poorly aligned), the per-head alphas concatenate into one ``(N, H*N)`` row
block and v is tiled into a head-block-diagonal ``(H*N, H*dh)`` operand, so
the whole per-graph aggregation is ONE 128-aligned MXU matmul whose output
columns are already the concatenated heads.

Forward-only kernel with a custom_vjp whose backward is XLA autodiff of the
reference math (`attend_math`) — the same pattern as fused_gat.py; training
always differentiates the XLA chain.

Measured on TPU v5e (flagship rollout shape, B_eff=1280, N=64, H=4, dh=16;
window-rollouts/s/chip at K=20), round 2:

| rollout attention variant                         | throughput |
|---------------------------------------------------|-----------:|
| XLA per-head chain (canonical, gat_math)           |      106k  |
| this kernel, block-diag aggregate, G=4/8/16/32     |   42-45k   |
| this kernel, per-head dots variant, G=8/16         |      45k   |
| XLA transposed chain (softmax over sublanes)       |      105k  |
| XLA heads-leading (H*B,N,N) single chain           |      55k   |
| XLA per-head transposed v streams                  |      107k  |
| XLA folded output projection (Dout per-head dots)  |      71k   |
| XLA + alpha/v cast to bf16 by hand                 |      106k  |
| scoped-VMEM limit 32/64/96 MiB (compiler option)   |  102/92/69k|
| latency-hiding sched / aggressive fusion options   |   105-107k |

Conclusion (full analysis in ARCHITECTURE.md): the profiled "data
formatting" ops are mostly HBM->VMEM staging of alpha for the aggregation
dots (memory-space promotion, not layout churn) plus transposed v slices;
XLA already auto-bf16s the chain.  Fusing the chain in Mosaic removes the
staging but pays more in per-program overhead and half-lane (N=64) VPU
occupancy.  At N=64 the XLA chain remains canonical and fastest.

ROUND-3 UPDATE — the kernel WINS at lane-filling graph sizes.  Op-level
sweep (f32, v5e; speedup of this kernel over the XLA chain, best group):

| N   | B_eff=256 | B_eff=512 | B_eff=1280 |
|-----|-----------|-----------|------------|
| 64  | 1.03x     | 0.88x     | 0.97x      |
| 128 | 1.57x     | 1.90x     | 2.22x      |
| 256 | 1.99x     | 3.00x     | 3.49x      |

End-to-end K=20 rollout at N=128: 71.8k vs 27.6k window-rollouts/s (2.6x);
at N=256: 30.7k vs 13.6k (2.3x).
At N>=128 the VPU lanes are full and the XLA chain's N^2 alpha staging
dominates; `ModelConfig.attend_kernel="auto"` (mmtraj/models/gat.py)
dispatches here on TPU for N>=128 with a VMEM-budgeted group size
(G=8 up to N=128, G=4 at N=256 — G=8 fails to compile there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9


def attend_math(v, s_src, s_dst, attend, num_heads: int):
    """Reference XLA math: per-head masked-softmax attention aggregate.

    v (B, N, H*dh) f32; s_src/s_dst (B, N, H) f32; attend (B, N, N) f32 0/1.
    Returns (B, N, H*dh) f32 — concat over heads of alpha^h @ v^h.  Identical
    to the per-head loop inside fused_gat.gat_math (single source of truth
    for equivalence tests and the backward pass).
    """
    dh = v.shape[-1] // num_heads
    cols = []
    for hh in range(num_heads):
        logits = s_src[:, :, hh][:, :, None] + s_dst[:, :, hh][:, None, :]
        logits = jax.nn.leaky_relu(logits, negative_slope=0.2)
        logits = jnp.where(attend > 0, logits, NEG_INF)
        m = jnp.max(logits, axis=2, keepdims=True)
        e = jnp.exp(logits - jax.lax.stop_gradient(m)) * attend
        alpha = e / jnp.maximum(e.sum(axis=2, keepdims=True), 1e-20)
        cols.append(jnp.einsum("bnm,bmd->bnd", alpha, v[:, :, hh * dh : (hh + 1) * dh]))
    return jnp.concatenate(cols, axis=-1)


def _attend_kernel(s_src_ref, s_dst_ref, v_ref, attend_ref, out_ref, *, num_heads: int):
    G, N, HD = v_ref.shape
    H = num_heads
    dh = HD // H
    v = v_ref[...]
    att = attend_ref[...]  # (G, N, N) f32 {0,1}
    alphas = []
    for h in range(H):
        ss = s_src_ref[:, h, :]  # (G, N)
        sd = s_dst_ref[:, h, :]
        logits = ss[:, :, None] + sd[:, None, :]  # (G, N, N)
        logits = jnp.where(logits > 0, logits, 0.2 * logits)
        logits = jnp.where(att > 0, logits, NEG_INF)
        m = jnp.max(logits, axis=2, keepdims=True)
        e = jnp.exp(logits - m) * att
        denom = jnp.maximum(jnp.sum(e, axis=2, keepdims=True), 1e-20)
        alphas.append(e / denom)
    a_cat = jnp.concatenate(alphas, axis=2)  # (G, N, H*N)
    # Head-block-diagonal v: rows [h*N, (h+1)*N) carry only columns of head h,
    # so ONE (N, H*N) @ (H*N, HD) matmul emits all heads pre-concatenated.
    row_head = jax.lax.broadcasted_iota(jnp.int32, (H * N, HD), 0) // N
    col_head = jax.lax.broadcasted_iota(jnp.int32, (H * N, HD), 1) // dh
    mask = (row_head == col_head).astype(v.dtype)
    v_stk = jnp.concatenate([v] * H, axis=1) * mask[None]  # (G, H*N, HD)
    out_ref[...] = jax.lax.dot_general(
        a_cat, v_stk, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _attend_pallas_fwd(v, s_src, s_dst, attend, num_heads: int, group: int):
    B, N, HD = v.shape
    G = group
    pad = (-B) % G
    if pad:
        zpad = lambda a: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
        )
        v, s_src, s_dst, attend = map(zpad, (v, s_src, s_dst, attend))
    Bp = v.shape[0]
    s_src_t = jnp.moveaxis(s_src, 2, 1)  # (B, H, N): head on sublanes
    s_dst_t = jnp.moveaxis(s_dst, 2, 1)
    H = num_heads
    out = pl.pallas_call(
        functools.partial(_attend_kernel, num_heads=num_heads),
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec((G, H, N), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, H, N), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, N, HD), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, N, N), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, N, HD), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, N, HD), jnp.float32),
        interpret=jax.default_backend() != "tpu",  # CPU CI runs the same tests
    )(s_src_t, s_dst_t, v, attend)
    return out[:B] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def attend_pallas(v, s_src, s_dst, attend, num_heads: int, group: int = 8):
    """Fused score+softmax+aggregate (see module docstring).

    Forward runs the Pallas kernel; gradients differentiate the identical XLA
    reference chain (attend_math) — equivalence pinned in tests/test_pallas.py.
    """
    return _attend_pallas_fwd(v, s_src, s_dst, attend, num_heads, group)


def _fwd(v, s_src, s_dst, attend, num_heads, group):
    out = _attend_pallas_fwd(v, s_src, s_dst, attend, num_heads, group)
    return out, (v, s_src, s_dst, attend)


def _bwd(num_heads, group, res, g):
    v, s_src, s_dst, attend = res
    _, vjp = jax.vjp(lambda vv, ss, sd: attend_math(vv, ss, sd, attend, num_heads),
                     v, s_src, s_dst)
    dv, dss, dsd = vjp(g)
    return dv, dss, dsd, None


attend_pallas.defvjp(_fwd, _bwd)

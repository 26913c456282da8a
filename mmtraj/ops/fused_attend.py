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

ROUND-3 UPDATE — the kernel WINS at lane-filling graph sizes, END-TO-END.
The dispatch evidence is the full K=20 rollout A/B (in-program scan timing,
same program either side of the one attend swap):

    N=128: XLA 27.6k vs kernel 71.8k window-rollouts/s (2.6x, re-confirmed)
    N=256: XLA 13.6k vs kernel 30.7k (2.3x)

Isolated op-level numbers are MUCH less favorable and were initially
mis-measured.  With the honest harness (op inside one jitted lax.scan, all
operands perturbed per iteration, output consumed — naive block_until_ready
loops return early behind the tunnel, and loop-invariant s_src/s_dst let
XLA hoist the whole softmax chain while the opaque kernel can't be):

| N   | B_eff=256 | B_eff=512 | B_eff=1280 |  (kernel/XLA, best group)
|-----|-----------|-----------|------------|
| 64  | 0.65x     | 0.53x     | 0.35x      |
| 128 | 0.89x     | 0.86x     | 0.70x      |
| 256 | 0.93x     | 1.29x     | 1.25x      |

The end-to-end win is real and larger than the op-level table because the
XLA chain IN CONTEXT pays what the isolated chain doesn't: inside the
fully-unrolled 12-step rollout program its (B_eff, N, N) alpha staging
contends for the scoped-VMEM window with every neighboring step's tensors,
while the kernel's working set stays private per program (XLA's unrolled
N=128 program also takes ~250 s to compile vs ~13 s with the kernel).
Dispatch therefore keys on the END-TO-END table:
`ModelConfig.attend_kernel="auto"` (mmtraj/models/gat.py) routes through
the kernel on TPU for N >= 128 with a VMEM-budgeted group size (G=8 up to
N=128, G=4 at N=256 — G=8 fails to compile there), and keeps XLA at the
flagship N=64 where the kernel loses both ways.

Lane-packing at N=64 (``packed=True``: two graphs side by side in the 128
lanes, masked dual softmax reductions, pair-block-diagonal aggregation)
was built to attack the half-lane occupancy and measured SLOWER than the
plain kernel at every shape (0.61/0.49/0.32x vs XLA at B_eff=256/512/1280): the
selects + dual reductions + a 2x-deader block-diagonal matmul (useful MAC
fraction 1/8 vs 1/4) cost more than full-lane pointwise ops save.  It
ships tested (exact vs attend_math) so the negative result stays
reproducible.
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


def _attend_kernel_packed(s_src_ref, s_dst_ref, v_ref, attend_ref, out_ref, *,
                          num_heads: int):
    """Lane-packed variant for half-lane graph sizes (2*N <= 128 lanes).

    The plain kernel's (G, N, N) tiles fill only N of the 128 TPU lanes, so
    at the flagship N=64 every VPU op pays 2x its useful throughput.  This
    variant packs TWO graphs side by side in the lane dimension: all
    pointwise softmax-chain ops run on (G/2, N, 2N) full-lane tiles, the
    per-graph max/sum reductions become masked dual reductions (same lane-
    reduction count, full occupancy), and the aggregation is one
    (N, H*2N) @ (H*2N, 2*HD) pair-block-diagonal matmul whose 128-wide
    output also fills the MXU lanes (the unpacked kernel's HD=64-wide dot
    is itself half-lane).  Outputs unpack by lane-slicing in VMEM.
    """
    G2, N, HD = v_ref.shape
    G = G2 // 2
    H = num_heads
    dh = HD // H
    att = jnp.concatenate([attend_ref[:G], attend_ref[G:]], axis=2)  # (G,N,2N)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * N), 2)
    left = lane < N
    alphas = []
    for h in range(H):
        ss = jnp.where(left, s_src_ref[:G, h, :][:, :, None],
                       s_src_ref[G:, h, :][:, :, None])       # (G, N, 2N)
        sd = jnp.concatenate([s_dst_ref[:G, h, :], s_dst_ref[G:, h, :]],
                             axis=1)                          # (G, 2N)
        logits = ss + sd[:, None, :]
        logits = jnp.where(logits > 0, logits, 0.2 * logits)
        logits = jnp.where(att > 0, logits, NEG_INF)
        # Per-graph row max/sum: mask the other half's lanes out, reduce at
        # full occupancy, select each half's own statistic back.
        m_a = jnp.max(jnp.where(left, logits, NEG_INF), axis=2, keepdims=True)
        m_b = jnp.max(jnp.where(left, NEG_INF, logits), axis=2, keepdims=True)
        e = jnp.exp(logits - jnp.where(left, m_a, m_b)) * att
        d_a = jnp.sum(jnp.where(left, e, 0.0), axis=2, keepdims=True)
        d_b = jnp.sum(jnp.where(left, 0.0, e), axis=2, keepdims=True)
        denom = jnp.maximum(jnp.where(left, d_a, d_b), 1e-20)
        alphas.append(e / denom)
    a_cat = jnp.concatenate(alphas, axis=2)  # (G, N, H*2N)
    # Pair-block-diagonal v: head-h block of 2N rows = [graph-a rows (cols
    # 0:HD, head-h slice); graph-b rows (cols HD:2HD, head-h slice)].
    vab = jnp.concatenate([v_ref[:G], v_ref[G:]], axis=1)  # (G, 2N, HD)
    v_rep = jnp.concatenate([vab] * H, axis=1)             # (G, 2HN, HD)
    V = jnp.concatenate([v_rep, v_rep], axis=2)            # (G, 2HN, 2HD)
    row = jax.lax.broadcasted_iota(jnp.int32, (2 * H * N, 2 * HD), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (2 * H * N, 2 * HD), 1)
    keep = ((row // N) % 2 == col // HD) & (row // (2 * N) == (col % HD) // dh)
    V = V * keep.astype(V.dtype)[None]
    packed = jax.lax.dot_general(
        a_cat, V, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                      # (G, N, 2HD)
    out_ref[:G] = packed[:, :, :HD]
    out_ref[G:] = packed[:, :, HD:]


def _attend_pallas_fwd(v, s_src, s_dst, attend, num_heads: int, group: int,
                       packed: bool = False):
    B, N, HD = v.shape
    G = group
    if packed and G % 2:
        raise ValueError("packed attend kernel needs an even group size")
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
    kern = _attend_kernel_packed if packed else _attend_kernel
    out = pl.pallas_call(
        functools.partial(kern, num_heads=num_heads),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def attend_pallas(v, s_src, s_dst, attend, num_heads: int, group: int = 8,
                  packed: bool = False):
    """Fused score+softmax+aggregate (see module docstring).

    Forward runs the Pallas kernel (``packed=True`` uses the lane-packed
    two-graphs-per-tile variant for 2*N <= 128); gradients differentiate the
    identical XLA reference chain (attend_math) — equivalence pinned in
    tests/test_pallas.py.
    """
    return _attend_pallas_fwd(v, s_src, s_dst, attend, num_heads, group, packed)


def _fwd(v, s_src, s_dst, attend, num_heads, group, packed):
    out = _attend_pallas_fwd(v, s_src, s_dst, attend, num_heads, group, packed)
    return out, (v, s_src, s_dst, attend)


def _bwd(num_heads, group, packed, res, g):
    v, s_src, s_dst, attend = res
    _, vjp = jax.vjp(lambda vv, ss, sd: attend_math(vv, ss, sd, attend, num_heads),
                     v, s_src, s_dst)
    dv, dss, dsd = vjp(g)
    return dv, dss, dsd, None


attend_pallas.defvjp(_fwd, _bwd)

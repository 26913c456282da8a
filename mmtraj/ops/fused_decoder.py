"""Fully-fused autoregressive decoder: the whole 12-step rollout in ONE
Pallas kernel.

The idea: per grid program, all decoder weights load into VMEM once and stay
there for every step; the recurrent state (h, xy) never touches HBM; the
only HBM traffic after the initial load is the (T, N, 2) trajectory write
and the streamed pre-generated randoms.

MEASURED OUTCOME (v5e, bench.py shapes B=64, N=64, K=20, 3-trial min, this
is why the kernel is OPT-IN and the XLA path stays the default):

  | rollout path                        | window-rollouts/s/chip |
  |-------------------------------------|------------------------|
  | XLA decode_rollout (per-head GAT)   |                  ~106k |
  | this kernel, group=8                |                   ~53k |
  | this kernel, group=16               |                   ~56k |

The whole-rollout fusion premise (weights re-read from HBM each step) does
not hold at these sizes: profiling the XLA path shows its time goes to the
attention softmax chain and XLA-inserted layout copies, not weight traffic,
and Mosaic's codegen for the small-N (64-lane) attention ops is ~2x slower
than XLA's fusions.  Kept because (a) it is exactly equivalence-tested
against the XLA path (same random stream => same trajectories, see below),
so it stays a safe target for future Mosaic improvements, and (b) the
scoped-VMEM/layout lessons are encoded here as working code.

Step pipeline fused per iteration (mirrors forecaster._step + gmm.sample):
  head matmul -> GMM constrain -> Gumbel-max component select -> correlated
  normal sample -> integrate positions -> proximity adjacency -> embed ->
  fused-gate GRU -> multi-head GAT -> residual.

Randomness: Gumbel and normal draws are pre-generated OUTSIDE with
jax.random (the same (B, T, N, .) batched draw under split(key) that
Forecaster.decode_rollout uses) and streamed in.  This keeps the kernel
deterministic given its inputs and gives EXACT stream parity with the
unfused path: tests/test_fused_decoder.py pins kernel == pure-jnp
`reference_decode` == Forecaster.rollout_k to float tolerance on identical
keys.

Head-weight layout: the canonical head emits [logits(M) | mu(M,2) |
sigma_raw(M,2) | rho_raw(M)]; the kernel wants per-quantity column blocks
[logits | mu_x | mu_y | s_x | s_y | rho], produced by `permute_head` — a pure
column permutation of the same parameters.

Restrictions (asserted): GRU cell, N in {8,16,32,64,128}, radius > 0.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


# --------------------------------------------------------------------------
# Head-weight permutation: canonical layout -> kernel column blocks.
# --------------------------------------------------------------------------


def permute_head(w: jnp.ndarray, b: jnp.ndarray, m: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(H, 6M), (6M,) canonical -> same params with columns grouped as
    [logits(M), mu_x(M), mu_y(M), sigma_x(M), sigma_y(M), rho(M)]."""
    idx = jnp.concatenate([
        jnp.arange(m),                          # logits
        m + 2 * jnp.arange(m),                  # mu_x   (mu stored (M,2) row-major)
        m + 2 * jnp.arange(m) + 1,              # mu_y
        3 * m + 2 * jnp.arange(m),              # sigma_x
        3 * m + 2 * jnp.arange(m) + 1,          # sigma_y
        5 * m + jnp.arange(m),                  # rho
    ])
    return w[:, idx], b[idx]


# --------------------------------------------------------------------------
# The shared step math, written to run identically inside the kernel (on
# VMEM blocks) and in the pure-jnp reference (on arrays).  g = graphs in
# this block, n = agents, flat = g*n rows.
# --------------------------------------------------------------------------


def _step_math(h, xy, maskf, gumbel_t, normal_t, W, stats4, consts):
    """One decode step.  h (g*n, H); xy (g, n, 2); maskf (g, n) {0,1};
    gumbel_t (g*n, M); normal_t (g*n, 2); stats4 (1, 4) =
    [mean_x, mean_y, std_x, std_y] (runtime array — stats may be jit-traced).
    Returns (h', xy')."""
    (emb_w, emb_b, wx, wh, cb, wv, asrc, adst, wo, bo, hw, hb) = W
    (m, num_heads, dh, radius, sigma_min, rho_max, g, n) = consts
    mean_x, mean_y = stats4[:, 0:1], stats4[:, 1:2]  # (1,1), broadcast below
    std_x, std_y = stats4[:, 2:3], stats4[:, 3:4]

    # ---- head + GMM sample (column-block layout) ----
    raw = jnp.dot(h, hw, preferred_element_type=jnp.float32) + hb  # (g*n, 6M)
    scores = raw[:, :m] + gumbel_t  # (g*n, M)
    mx = jnp.max(scores, axis=1, keepdims=True)
    eq = (scores == mx).astype(jnp.float32)
    # First-max one-hot via static unroll (Mosaic has no cumsum); ties break
    # toward the lowest component index, identically in kernel and reference.
    taken = jnp.zeros_like(eq[:, :1])
    cols = []
    for j in range(m):
        cj = eq[:, j : j + 1] * (1.0 - taken)
        cols.append(cj)
        taken = jnp.maximum(taken, cj)
    onehot = jnp.concatenate(cols, axis=1)
    # Everything stays 2-D (g*n, 1): Mosaic's layout inference rejects 1-D
    # intermediates ("unsupported shape cast").
    pick = lambda c0: jnp.sum(  # noqa: E731
        onehot * raw[:, c0 * m : (c0 + 1) * m], axis=1, keepdims=True
    )
    mu_x, mu_y = pick(1), pick(2)
    softplus = lambda x: jnp.log1p(jnp.exp(-jnp.abs(x))) + jnp.maximum(x, 0.0)  # noqa: E731
    s_x = softplus(pick(3)) + sigma_min
    s_y = softplus(pick(4)) + sigma_min
    rho = rho_max * jnp.tanh(pick(5))
    z0, z1 = normal_t[:, 0:1], normal_t[:, 1:2]
    dx = mu_x + s_x * z0  # (g*n, 1)
    dy = mu_y + s_y * (rho * z0 + jnp.sqrt(jnp.maximum(1.0 - rho * rho, 1e-6)) * z1)
    dxy_n = jnp.concatenate([dx, dy], axis=1)  # (g*n, 2) normalized offsets

    # ---- integrate (denormalize) ----
    dxy_w = jnp.concatenate([dx * std_x + mean_x, dy * std_y + mean_y], axis=1)
    xy = xy + dxy_w.reshape(g, n, 2)

    # ---- proximity adjacency on the new positions ----
    px, py = xy[:, :, 0], xy[:, :, 1]  # (g, n)
    d2 = (px[:, :, None] - px[:, None, :]) ** 2 + (py[:, :, None] - py[:, None, :]) ** 2
    pairm = maskf[:, :, None] * maskf[:, None, :]  # (g, n, n)
    eye = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) == jax.lax.broadcasted_iota(
        jnp.int32, (n, n), 1
    )
    eyef = eye.astype(jnp.float32)[None]
    attend = pairm * (1.0 - eyef) * (d2 <= radius * radius).astype(jnp.float32)
    attend = attend + eyef * pairm  # self-loops for valid agents

    # ---- embed + fused-gate GRU ----
    x_in = jnp.maximum(
        jnp.dot(dxy_n, emb_w, preferred_element_type=jnp.float32) + emb_b, 0.0
    )  # (g*n, E)
    xg = jnp.dot(x_in, wx, preferred_element_type=jnp.float32) + cb
    hg = jnp.dot(h, wh, preferred_element_type=jnp.float32)
    hid = h.shape[-1]
    zg = jax.nn.sigmoid(xg[:, :hid] + hg[:, :hid])
    rg = jax.nn.sigmoid(xg[:, hid : 2 * hid] + hg[:, hid : 2 * hid])
    ng = jnp.tanh(xg[:, 2 * hid :] + rg * hg[:, 2 * hid :])
    h = (1.0 - zg) * ng + zg * h

    # ---- multi-head GAT (same math as ops.fused_gat) ----
    v = jnp.dot(h, wv, preferred_element_type=jnp.float32)  # (g*n, HD)
    ss = jnp.dot(v, asrc, preferred_element_type=jnp.float32).reshape(g, n, num_heads)
    sd = jnp.dot(v, adst, preferred_element_type=jnp.float32).reshape(g, n, num_heads)
    outs = []
    for hh in range(num_heads):
        logits = ss[:, :, hh][:, :, None] + sd[:, :, hh][:, None, :]  # (g, n, n)
        logits = jnp.where(logits > 0, logits, 0.2 * logits)
        logits = jnp.where(attend > 0, logits, NEG_INF)
        mxl = jnp.max(logits, axis=2, keepdims=True)
        e = jnp.exp(logits - mxl) * attend
        alpha = e / jnp.maximum(jnp.sum(e, axis=2, keepdims=True), 1e-20)
        vh = v.reshape(g, n, -1)[:, :, hh * dh : (hh + 1) * dh]
        outs.append(
            jax.lax.dot_general(
                alpha, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    gat = jnp.concatenate(outs, axis=2).reshape(g * n, -1)
    gat = jnp.dot(gat, wo, preferred_element_type=jnp.float32) + bo
    # Zero padded rows (matches gat_apply).  Via 3-D broadcast: a
    # (g,n)->(g*n,1) reshape is a lane->sublane relayout Mosaic rejects.
    gat = (gat.reshape(g, n, -1) * maskf[:, :, None]).reshape(g * n, -1)
    h = h + gat
    return h, xy


# --------------------------------------------------------------------------
# Pallas kernel: loop the step math over T with state in VMEM.
# --------------------------------------------------------------------------


def _decoder_kernel(
    h0_ref, xy0_ref, mask_ref, gum_ref, nrm_ref, stats_ref,
    emb_w_ref, emb_b_ref, wx_ref, wh_ref, cb_ref,
    wv_ref, asrc_ref, adst_ref, wo_ref, bo_ref, hw_ref, hb_ref,
    out_ref,
    *, t_steps: int, consts,
):
    g, n = consts[-2], consts[-1]
    W = (
        emb_w_ref[:], emb_b_ref[:], wx_ref[:], wh_ref[:], cb_ref[:],
        wv_ref[:], asrc_ref[:], adst_ref[:], wo_ref[:], bo_ref[:],
        hw_ref[:], hb_ref[:],
    )
    h = h0_ref[:].reshape(g * n, -1)
    xy = xy0_ref[:]
    maskf = mask_ref[:]
    stats4 = stats_ref[:]
    for t in range(t_steps):  # static unroll (T=12)
        gum_t = gum_ref[:, t].reshape(g * n, -1)
        nrm_t = nrm_ref[:, t].reshape(g * n, 2)
        h, xy = _step_math(h, xy, maskf, gum_t, nrm_t, W, stats4, consts)
        out_ref[:, t] = xy


def fused_decode(
    h0, xy0, mask, gumbel, normal, params_dec, head_w, head_b, *,
    num_heads: int, num_mixtures: int, radius: float, sigma_min: float,
    rho_max: float, stats_mean, stats_std, group: int = 8,
):
    """Run the fused rollout.  h0 (B, N, H); xy0 (B, N, 2); mask (B, N) bool;
    gumbel (B, T, N, M); normal (B, T, N, 2); head_w/head_b already permuted
    (permute_head).  Returns trajectory (B, T, N, 2) float32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, H = h0.shape
    T = gumbel.shape[1]
    M = num_mixtures
    assert radius > 0, "fused decoder requires a finite adjacency radius"
    assert N in (8, 16, 32, 64, 128), (
        f"fused decoder requires a lane-tileable agent count, got N={N}; "
        "use the XLA path (use_fused_decoder=False) for other shapes"
    )
    G = group
    while B % G:
        G //= 2
    G = max(G, 1)
    dh = params_dec["gat"]["wv"].shape[1] // num_heads
    # radius/sigma_min/rho_max are model-config constants; normalization
    # stats are RUNTIME inputs (they are jit-traced in evaluate/predict).
    consts = (
        M, num_heads, dh, float(radius), float(sigma_min), float(rho_max), G, N,
    )
    stats4 = jnp.concatenate(
        [jnp.asarray(stats_mean, jnp.float32).reshape(2),
         jnp.asarray(stats_std, jnp.float32).reshape(2)]
    ).reshape(1, 4)
    kernel = functools.partial(_decoder_kernel, t_steps=T, consts=consts)
    f32 = jnp.float32
    fixed = lambda b: (0, 0)  # noqa: E731

    def blk(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    dc = params_dec["cell"]
    de = params_dec["embed"]
    dg = params_dec["gat"]
    E = de["w"].shape[1]
    HD = dg["wv"].shape[1]
    from mmtraj.ops.fused_gat import _block_diag

    args = (
        h0.astype(f32), xy0.astype(f32), mask.astype(f32),
        gumbel.astype(f32), normal.astype(f32), stats4,
        de["w"].astype(f32), de["b"].astype(f32)[None, :],
        dc["wx"].astype(f32), dc["wh"].astype(f32), dc["b"].astype(f32)[None, :],
        dg["wv"].astype(f32),
        _block_diag(dg["a_src"].astype(f32)), _block_diag(dg["a_dst"].astype(f32)),
        dg["wo"].astype(f32), dg["bo"].astype(f32)[None, :],
        head_w.astype(f32), head_b.astype(f32)[None, :],
    )
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            blk((G, N, H), lambda b: (b, 0, 0)),
            blk((G, N, 2), lambda b: (b, 0, 0)),
            blk((G, N), lambda b: (b, 0)),
            blk((G, T, N, M), lambda b: (b, 0, 0, 0)),
            blk((G, T, N, 2), lambda b: (b, 0, 0, 0)),
            blk((1, 4), fixed),
            blk((2, E), fixed), blk((1, E), fixed),
            blk((E, 3 * H), fixed), blk((H, 3 * H), fixed), blk((1, 3 * H), fixed),
            blk((H, HD), fixed),
            blk((HD, num_heads), fixed), blk((HD, num_heads), fixed),
            blk((HD, H), fixed), blk((1, H), fixed),
            blk((H, 6 * M), fixed), blk((1, 6 * M), fixed),
        ],
        out_specs=blk((G, T, N, 2), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, N, 2), f32),
        # The statically-unrolled 12-step loop needs ~18MB of scoped VMEM at
        # G=8/N=64, over the 16MB default; v5e has 128MB physical VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(*args)


# --------------------------------------------------------------------------
# Pure-jnp reference consuming the same randoms (equivalence oracle).
# --------------------------------------------------------------------------


def reference_decode(
    h0, xy0, mask, gumbel, normal, params_dec, head_w, head_b, *,
    num_heads: int, num_mixtures: int, radius: float, sigma_min: float,
    rho_max: float, stats_mean, stats_std,
):
    B, N, H = h0.shape
    T = gumbel.shape[1]
    dh = params_dec["gat"]["wv"].shape[1] // num_heads
    from mmtraj.ops.fused_gat import _block_diag

    W = (
        params_dec["embed"]["w"], params_dec["embed"]["b"][None, :],
        params_dec["cell"]["wx"], params_dec["cell"]["wh"],
        params_dec["cell"]["b"][None, :],
        params_dec["gat"]["wv"],
        _block_diag(params_dec["gat"]["a_src"]), _block_diag(params_dec["gat"]["a_dst"]),
        params_dec["gat"]["wo"], params_dec["gat"]["bo"][None, :],
        head_w, head_b[None, :],
    )
    consts = (
        num_mixtures, num_heads, dh, float(radius), float(sigma_min),
        float(rho_max), B, N,
    )
    stats4 = jnp.concatenate(
        [jnp.asarray(stats_mean, jnp.float32).reshape(2),
         jnp.asarray(stats_std, jnp.float32).reshape(2)]
    ).reshape(1, 4)
    h = h0.reshape(B * N, H).astype(jnp.float32)
    xy = xy0.astype(jnp.float32)
    maskf = mask.astype(jnp.float32)
    outs = []
    for t in range(T):
        h, xy = _step_math(
            h, xy, maskf,
            gumbel[:, t].reshape(B * N, -1).astype(jnp.float32),
            normal[:, t].reshape(B * N, 2).astype(jnp.float32),
            W, stats4, consts,
        )
        outs.append(xy)
    return jnp.stack(outs, axis=1)  # (B, T, N, 2)

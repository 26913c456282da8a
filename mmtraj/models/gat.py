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

from mmtraj.models.layers import Params, glorot


def gat_init(key, din: int, dout: int, num_heads: int) -> Params:
    assert dout % num_heads == 0, "num_heads must divide dout"
    dh = dout // num_heads
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "wv": glorot(k1, (din, num_heads * dh)),
        "a_src": glorot(k2, (num_heads, dh)),
        "a_dst": glorot(k3, (num_heads, dh)),
        "wo": glorot(k4, (num_heads * dh, dout)),
        "bo": jnp.zeros((dout,), jnp.float32),
    }


def _attend_group(n: int, num_heads: int, hd: int) -> int:
    """Graphs per Pallas attend program, sized so the per-program VMEM
    working set (a_cat (G,N,H*N) f32 dominates, plus attend + block-diag v)
    stays under ~8 MiB — the largest budget that compiled across the
    measured shapes (G=8 at N=256 fails; G=4 runs)."""
    per_g = n * num_heads * n * 4 + n * n * 4 + num_heads * n * hd * 4
    g = max(1, (8 * 2**20) // per_g)
    return min(8, 1 << (g.bit_length() - 1))  # floor to a power of two


def _use_attend_kernel(attend_kernel: str, use_pallas: bool, n: int,
                       train: bool) -> bool:
    """The attend-chain dispatch rule (ARCHITECTURE.md pts 12-13): "auto"
    routes through the Pallas kernel only at lane-filling N on TPU AND on
    non-differentiated paths (the kernel wins rollout 2.3-2.6x end-to-end
    at N>=128 but every measured grad program — teacher-forced NLL and the
    rematted variety rollout alike — is slower through it); explicit pins
    always apply."""
    if attend_kernel not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown attend_kernel {attend_kernel!r}")
    return not use_pallas and (
        attend_kernel == "pallas"
        or (attend_kernel == "auto" and n >= 128 and not train
            and jax.default_backend() == "tpu")
    )


def gat_apply(
    p: Params,
    h: jnp.ndarray,
    adj: jnp.ndarray,
    mask: jnp.ndarray,
    num_heads: int,
    dtype=None,
    use_pallas: bool = False,
    attend_kernel: str = "auto",
    train: bool = False,
) -> jnp.ndarray:
    """h (B, N, D), adj (B, N, N) bool, mask (B, N) bool -> (B, N, dout).

    score_ij = LeakyReLU(a_src . v_i + a_dst . v_j); alpha = masked softmax
    over neighbors j (self-loop included for valid i); out_i = Wo [concat_h
    sum_j alpha_ij v_j].

    ``use_pallas=True`` routes the whole layer through the fused Pallas TPU
    kernel (mmtraj/ops/fused_gat.py) — equivalence-tested against this XLA
    path, which stays canonical (SURVEY.md §7 hard part 5).

    ``attend_kernel`` picks the backend for the score+softmax+aggregate
    chain alone (projections stay XLA): "auto" uses the Pallas flash-style
    kernel (mmtraj/ops/fused_attend.py) on TPU at lane-filling graph sizes
    (N >= 128, measured 2.3-2.6x end-to-end over the XLA chain; ARCHITECTURE.md pt 12)
    and XLA otherwise; "xla"/"pallas" pin it.  Backward is always XLA
    autodiff of the identical math (custom_vjp).

    ``train=True`` marks a differentiated path: "auto" then stays on the
    XLA chain even at dense N — the grad program (custom_vjp backward +
    remat forward replay around the kernel boundary) measured 10-14%
    SLOWER with the kernel at N=128/256 on both teacher-forced NLL and
    the rematted variety rollout (train_bench --attend-kernel A/B,
    ARCHITECTURE.md pt 13), while the inference win stands.  An explicit
    "pallas" pin still applies everywhere.
    """
    from mmtraj.ops.fused_gat import fused_gat, gat_math

    N = h.shape[-2]
    eye = jnp.eye(N, dtype=bool)
    attend = adj | (eye[None] & mask[:, None, :] & mask[:, :, None])  # (B, N, N)
    hin = h.astype(dtype) if dtype is not None else h
    use_attend = _use_attend_kernel(attend_kernel, use_pallas, N, train)
    if use_attend:
        from mmtraj.ops.fused_attend import attend_pallas
        from mmtraj.ops.fused_gat import _block_diag

        v = jnp.einsum("bnd,de->bne", hin, p["wv"]).astype(jnp.float32)
        s_src = v @ _block_diag(p["a_src"].astype(jnp.float32))  # (B, N, H)
        s_dst = v @ _block_diag(p["a_dst"].astype(jnp.float32))
        dh = p["wv"].shape[1] // num_heads
        agg = attend_pallas(v, s_src, s_dst, attend.astype(jnp.float32),
                            num_heads, _attend_group(N, num_heads, dh))
        out = agg @ p["wo"].astype(jnp.float32) + p["bo"]
    else:
        fn = fused_gat if use_pallas else gat_math
        out = fn(
            hin, attend.astype(jnp.float32), p["wv"], p["a_src"], p["a_dst"],
            p["wo"], p["bo"], num_heads,
        )
    return jnp.where(mask[..., None], out, 0.0)

#!/usr/bin/env python
"""Headline benchmark: trajectory rollouts/sec/chip at K=20 (BASELINE.json:2).

Measures the flagship model (config-4 shape: multi-head GAT over dense padded
graphs, GMM head, fused Pallas GAT kernel on TPU) running the full eval stack
— encode + K=20 sampled autoregressive rollouts — and divides by a
reference-style NumPy loop baseline measured on this same machine
(mmtraj/benchmarks/reference_loop.py; the real reference repo is absent —
SURVEY.md §0/§7 — so the in-repo loop is the documented stand-in denominator).

Timing methodology: the iteration loop runs INSIDE one jitted program
(`lax.scan` over RNG keys) and the scalar result is fetched to host, which is
a hard sync.  This matters on this machine: the TPU is reached through a
tunnel where `block_until_ready` returns early, inflating naive loop timings
by >5x (measured).  Best-of-3 trials is reported.

A "rollout" = one sampled 12-step future for one scene window at K=20 (i.e.
value counts window*K rollouts per second on one chip).

Prints exactly ONE JSON line to stdout; progress goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Persistent compile cache: the full-unroll eval program is expensive to
# compile cold (808 s in BENCH_r03); cached reruns start in seconds.  Env vars
# are read too late on this machine (the axon sitecustomize imports jax at
# interpreter startup), so this must go through jax.config.update — done by
# enable_compile_cache() inside main() after the mmtraj import.


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mmtraj.config import get_config
    from mmtraj.data.transforms import NormStats
    from mmtraj.models.forecaster import Forecaster
    from mmtraj.utils.compile_cache import enable_compile_cache

    cache_dir = enable_compile_cache()
    log(f"compile cache: {cache_dir}")

    cfg = get_config("4")  # flagship: multi-head GAT, GMM, dense crowds
    on_tpu = jax.default_backend() == "tpu"
    # The canonical XLA GAT path measures fastest at these shapes (106k/s vs
    # 85k/s for the best fused-Pallas variant — see mmtraj/ops/fused_gat.py
    # for the comparison log); the kernel stays available via use_pallas.
    # scan_unroll=12 fully unrolls the 8/12-step time loops: the rollout is
    # latency-bound and dropping the XLA while-loops measured +7.5%
    # (168k -> 180k window-rollouts/s; unroll 2/3/4 were neutral, and
    # training is *slower* unrolled — ARCHITECTURE.md pt 10).
    model_cfg = dataclasses.replace(cfg.model, use_pallas=False, scan_unroll=12)
    # B=25 is the measured optimum, not a tuning accident: at B*K=500 rows the
    # per-head attention tensor alpha ([B*K, N, N] bf16 = 4.10 MB) fits XLA's
    # scoped-VMEM window, so the softmax->aggregate chain never round-trips
    # alpha through HBM.  One more window (B=26, 4.26 MB) crosses the boundary
    # and throughput collapses 167k -> 111k/s.  Full sweep + the HLO-level
    # staging analysis: ARCHITECTURE.md pt 8.  Throughput is per *window*, so
    # trading batch width for more in-flight batches is free at eval time.
    B, N, TO, TP, K = 25, cfg.data.n_max, cfg.data.obs_len, cfg.data.pred_len, 20
    ITERS = 400 if on_tpu else 2

    log(f"device: {jax.devices()[0]}  B={B} N={N} obs={TO} pred={TP} K={K} "
        f"iters={ITERS} pallas={model_cfg.use_pallas}")

    model = Forecaster(model_cfg, TO, TP)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))

    rng = np.random.default_rng(0)
    steps = rng.normal(size=(B, N, TO, 2)).astype(np.float32) * 0.4
    xy_obs = jnp.asarray(np.cumsum(steps, axis=2) + rng.normal(size=(B, N, 1, 2)) * 5)
    mask = jnp.asarray(rng.random((B, N)) < 0.75)

    @jax.jit
    def many(p, x, m, key):
        keys = jax.random.split(key, ITERS)

        def body(c, k):
            # Tiny per-iteration input perturbation: makes the ENCODER depend
            # on the scan-carried key, so XLA cannot hoist the loop-invariant
            # encode out of the timed loop (it could before: params/inputs
            # fixed, only the rollout key varied -> 'encode + K rollouts'
            # amortized encode across ITERS, ~3% inflation at these shapes).
            xk = x + jax.random.uniform(k, (), jnp.float32, 0.0, 1e-6)
            r = model.rollout_k(p, xk, m, stats, k, K)
            return c + r.mean(), None  # consume result; keeps data dependency

        return jax.lax.scan(body, 0.0, keys)[0]

    t0 = time.time()
    float(many(params, xy_obs, mask, jax.random.PRNGKey(1)))  # compile+run
    log(f"compile+first run: {time.time() - t0:.1f}s")

    # Best-of-5: the tunnel adds ~1% trial-to-trial jitter (measured spread
    # 1.114-1.126 s); the min of 5 estimates sustained throughput with less
    # downward bias than 3 without changing the workload.
    times = []
    for trial in range(5):
        t0 = time.time()
        float(many(params, xy_obs, mask, jax.random.PRNGKey(trial)))  # host fetch = sync
        times.append(time.time() - t0)
    dt = min(times)
    tpu_rps = B * K * ITERS / dt
    log(f"trials: {[f'{t:.3f}s' for t in times]} -> {tpu_rps:,.0f} window-rollouts/s/chip "
        f"({tpu_rps * int(np.asarray(mask).sum()) / B:,.0f} agent-trajectories/s)")

    # MFU / roofline (VERDICT r4 #2): own the utilization number next to the
    # contract metric.  FLOPs and bytes come from XLA's cost analysis of the
    # COMPILED program (optimized HLO — fusion included).  Verified quirk on
    # this backend: the analysis counts a lax.scan/while BODY ONCE, not
    # trip-count times — the 400-iter program reports 31.23 GF, identical to
    # an un-scanned single-rollout program's count — so `flops` here is
    # per-ITERATION and sustained FLOP/s is flops * ITERS / dt.  Peaks: v5e
    # MXU 197 TF/s bf16 / ~49 TF/s f32 (same constants as train_bench); MFU
    # is quoted against the model's matmul-precision peak.  'bytes accessed'
    # is HLO-level operand traffic, NOT physical HBM bytes: at these shapes
    # it exceeds what HBM could physically stream in the measured time
    # (~5.7 GB/iter vs 819 GB/s * 2.8 ms = 2.3 GB), which is itself direct
    # evidence the working set stays VMEM-resident/fused (ARCHITECTURE pt 8)
    # — the roofline paragraph in RESULTS.md interprets this.
    flops_ps = mfu = None
    try:
        ca = many.lower(params, xy_obs, mask,
                        jax.random.PRNGKey(1)).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_iter = float(ca.get("flops", 0.0))
        bytes_iter = float(ca.get("bytes accessed", 0.0))
        # Peak = 197 TF/s bf16 REGARDLESS of model dtype: JAX's DEFAULT
        # matmul precision on TPU executes f32 matmuls as single bf16 MXU
        # passes, so bf16 is the precision actually running.  Verified
        # empirically on this program (round 5): forcing
        # jax_default_matmul_precision="highest" (true f32, multi-pass)
        # halves throughput (176k -> 89k w/s) and shifts the result at the
        # 1e-3 level, while dtype="bfloat16" is bit-identical and
        # throughput-neutral vs default-f32 — both facts only consistent
        # with default-f32 already being bf16-pass matmuls.
        flops_ps = flops_iter * ITERS / dt
        mfu = 100.0 * flops_ps / 197e12
        log(f"cost analysis: {flops_iter / 1e9:.3f} GF/iter, "
            f"{bytes_iter / 1e9:.2f} GB-HLO-accessed/iter, "
            f"{dt / ITERS * 1e3:.2f} ms/iter -> "
            f"{flops_ps / 1e12:.2f} TFLOP/s sustained = {mfu:.1f}% of the "
            f"197 TF/s bf16 MXU peak (the executing matmul precision at "
            f"jax default; see comment)")
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        log(f"cost analysis unavailable: {type(e).__name__}: {e}")

    # Reference-style loop baseline: one window, K=20, same architecture/sizes.
    from mmtraj.benchmarks.reference_loop import ReferenceStyleForecaster

    ref = ReferenceStyleForecaster(
        params, model_cfg.num_heads, model_cfg.num_mixtures, model_cfg.adjacency_radius,
        model_cfg.sigma_min, model_cfg.rho_max, stats.mean, stats.std,
    )
    w_mask = np.asarray(mask[0])
    w_obs = np.asarray(xy_obs[0])[w_mask]  # valid agents only — loop pays no padding
    nrng = np.random.default_rng(0)
    ref.rollout(w_obs[:, :2], k=1, pred_len=2, rng=nrng)  # warm caches
    # Denominator methodology (VERDICT r3 weak #4): the old 3-iteration
    # wall-clock total swung the headline multiplier 2x between rounds purely
    # with host load.  Per-iteration MIN wall time estimates the loop's
    # uncontended rate (contention only ever ADDS time), cross-checked
    # against process CPU-seconds, which other processes cannot inflate —
    # the two agree within ~10% on a quiet host because the loop is a
    # single-threaded Python/NumPy program at sub-BLAS-threshold shapes.
    ref_iters = 6
    per_iter, t_cpu0 = [], time.process_time()
    for _ in range(ref_iters):
        t0 = time.time()
        ref.rollout(w_obs, k=K, pred_len=TP, rng=nrng)
        per_iter.append(time.time() - t0)
    cpu_dt = (time.process_time() - t_cpu0) / ref_iters
    ref_rps = K / min(per_iter)  # window-rollouts/s (1 window per call)
    log(f"reference-style loop: {ref_iters} windows (N={len(w_obs)}), "
        f"per-window wall {[f'{t:.2f}' for t in per_iter]}s "
        f"(min {min(per_iter):.2f}, cpu {cpu_dt:.2f}) "
        f"-> {ref_rps:.2f} window-rollouts/s (min-wall denominator; "
        f"cpu-time check {K / cpu_dt:.2f}/s)")

    # Second denominator (bracketing): best-case host — same math fully
    # vectorized in NumPy, K folded into batch like the TPU path.  A real
    # host implementation lands between the loop and this.  Run at the HOST's
    # own favorable batch (B_HOST=64 amortizes NumPy dispatch best), not the
    # TPU's VMEM-optimal B: each side of the bracket gets its best setting.
    from mmtraj.benchmarks.vectorized_host import VectorizedHostForecaster

    vec = VectorizedHostForecaster(
        params, model_cfg.num_heads, model_cfg.num_mixtures, model_cfg.adjacency_radius,
        model_cfg.sigma_min, model_cfg.rho_max, stats.mean, stats.std,
    )
    B_HOST = 64
    hsteps = rng.normal(size=(B_HOST, N, TO, 2)).astype(np.float32) * 0.4
    xy_np = (np.cumsum(hsteps, axis=2)
             + rng.normal(size=(B_HOST, N, 1, 2)) * 5).astype(np.float32)
    mask_np = rng.random((B_HOST, N)) < 0.75
    vec.rollout_batch(xy_np[:2], mask_np[:2], k=2, pred_len=2, rng=nrng)  # warm
    vec_times = []
    for _ in range(2):  # min-of-2: same contention-robust estimator as above
        t0 = time.time()
        vec.rollout_batch(xy_np, mask_np, k=K, pred_len=TP, rng=nrng)
        vec_times.append(time.time() - t0)
    vec_dt = min(vec_times)
    vec_rps = B_HOST * K / vec_dt
    log(f"vectorized-host (NumPy, K-in-batch): {B_HOST} windows x K={K} in {vec_dt:.2f}s "
        f"-> {vec_rps:,.1f} window-rollouts/s")

    vs = tpu_rps / ref_rps
    print(json.dumps({
        "metric": "rollouts_per_sec_per_chip_k20",
        "value": round(tpu_rps, 1),
        "unit": "window-rollouts/s/chip (K=20, N_max=64, obs=8, pred=12)",
        "vs_baseline": round(vs, 1),
        "vs_vectorized_host": round(tpu_rps / vec_rps, 1),
        **({"tflops_per_sec": round(flops_ps / 1e12, 3),
            "mfu_pct": round(mfu, 2),
            "mfu_peak": "bf16-197TF"} if mfu is not None else {}),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

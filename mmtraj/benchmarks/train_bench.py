"""Training-step microbenchmark: steps/s, windows/s, XLA-counted FLOPs, MFU.

VERDICT round-1 task 4 asked for a device-time breakdown and an MFU estimate
of the *training* step (the rollout/eval stack already has one in
ARCHITECTURE.md).  This module times the exact jitted step `mmtraj.train`
uses (same `make_train_step`, same donation/sharding story) over a sweep of
(batch, dtype, remat) on whatever device JAX provides, and derives:

- steps/s and windows/s (throughput the user sees),
- FLOPs/step from the compiled executable's own cost model
  (`compiled.cost_analysis()['flops']` — XLA's count of the optimized HLO,
  so remat's recompute FLOPs are *included*),
- MFU against the TPU v5e peak for the matmul precision in use.

Peak convention: v5e MXU peak is ~197 TFLOP/s in bf16 and ~1/4 of that
(~49 TFLOP/s) for f32 matmuls (f32 runs as multi-pass bf16 on the MXU).
MFU is reported against the peak matching `ModelConfig.dtype`, so f32 and
bf16 rows are each compared to what the hardware could do at that precision.

Run:  python -m mmtraj.benchmarks.train_bench --sweep
      python -m mmtraj.benchmarks.train_bench --batch 128 --profile /tmp/tb
(the --profile dir can be fed to `python -m mmtraj.cli profile-stats`).

Reference counterpart: none — the reference (SURVEY.md §6) publishes no
training-throughput numbers; these tables are the rebuild's own contract.
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmtraj.config import config4
from mmtraj.data.transforms import NormStats
from mmtraj.models.forecaster import Forecaster
from mmtraj.train import make_optimizer, make_train_step

# TPU v5e ("v5 lite") MXU peak, dense matmul FLOP/s.
PEAK_FLOPS = {"bfloat16": 197e12, "float32": 197e12 / 4}


@dataclasses.dataclass
class TrainBenchResult:
    batch_size: int
    dtype: str
    remat: bool
    remat_policy: str
    steps_per_sec: float
    windows_per_sec: float
    flops_per_step: Optional[float]
    mfu: Optional[float]
    compile_s: float


def _fake_batch(batch_size: int, n_max: int, t_total: int, seed: int = 0):
    """Random walk windows + a univ-like ~2/3-full mask, device-resident."""
    rng = np.random.default_rng(seed)
    steps = rng.normal(scale=0.15, size=(batch_size, n_max, t_total, 2))
    xy = np.cumsum(steps, axis=2) + rng.uniform(0, 12, size=(batch_size, n_max, 1, 2))
    n_valid = rng.integers(max(1, n_max // 2), n_max + 1, size=batch_size)
    mask = np.arange(n_max)[None, :] < n_valid[:, None]
    return jax.device_put(jnp.asarray(xy, jnp.float32)), jax.device_put(
        jnp.asarray(mask)
    )


def bench_train_step(
    batch_size: int = 128,
    dtype: str = "float32",
    remat: bool = True,
    n_max: int = 64,
    iters: int = 30,
    warmup: int = 3,
    profile_dir: Optional[str] = None,
    unroll: int = 1,
    remat_policy: str = "full",
    attend_kernel: Optional[str] = None,
    min_seconds: float = 3.0,
    loss_mode: str = "nll",
    variety_n: int = 8,
    encoder: str = "rnn",
    attn_layers: int = 2,
) -> TrainBenchResult:
    """Time the config-4 (flagship) jitted train step at the given knobs.

    ``attend_kernel`` overrides ModelConfig.attend_kernel ("auto" routes the
    score+softmax+aggregate chain through the Pallas kernel at N>=128 on
    TPU; pass "xla" to pin the canonical chain for A/B at dense N).
    ``loss_mode``/``variety_n`` select the objective (same knobs as
    TrainConfig.loss) — "variety" times the winner-takes-all step the
    quality-headline recipe trains with (n rollouts differentiated per
    step), which costs more than the parity NLL step.
    ``encoder``/``attn_layers`` select the observation-encoder family
    (ModelConfig.encoder: "rnn" scan vs "attn" spatio-temporal attention).
    """
    cfg = config4()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, dtype=dtype, remat=remat, scan_unroll=unroll,
            remat_policy=remat_policy, encoder=encoder, attn_layers=attn_layers,
            **({"attend_kernel": attend_kernel} if attend_kernel else {}),
        ),
        train=dataclasses.replace(cfg.train, batch_size=batch_size),
    )
    model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    stats = NormStats(np.zeros(2, np.float32), np.ones(2, np.float32))
    xy, mask = _fake_batch(batch_size, n_max, cfg.data.obs_len + cfg.data.pred_len)
    step_fn = make_train_step(model, optimizer, stats, loss_mode=loss_mode,
                              variety_n=variety_n)
    # Non-NLL objectives (and dropout) thread an in-program RNG step index.
    extra = ((jnp.int32(0),) if (loss_mode != "nll" or model.cfg.dropout > 0)
             else ())

    t0 = time.time()
    lowered = step_fn.lower(params, opt_state, xy, mask, *extra)
    compiled = lowered.compile()
    compile_s = time.time() - t0
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    for _ in range(max(warmup, 1)):  # >=1: the timed loop needs a warm cache
        params, opt_state, loss = compiled(params, opt_state, xy, mask, *extra)
    float(loss)  # hard sync before the timed window (same reason as below)

    if min_seconds:
        # Size the timed window so the residual sync tail (~24 ms, see below)
        # is <1% of dt: pre-measure a few steps, then scale iters.
        t0 = time.time()
        for _ in range(5):
            params, opt_state, loss = compiled(params, opt_state, xy, mask, *extra)
        float(loss)
        est_sps = 5 / (time.time() - t0)
        iters = max(iters, int(min_seconds * est_sps) + 1)

    import contextlib

    prof = (
        jax.profiler.trace(profile_dir) if profile_dir else contextlib.nullcontext()
    )
    with prof:
        t0 = time.time()
        for _ in range(iters):
            params, opt_state, loss = compiled(params, opt_state, xy, mask, *extra)
        # Hard sync: behind the tunnel block_until_ready alone returns ~one
        # in-flight step early (~24 ms measured — a 2-6% optimism at small
        # iters); fetching the scalar is a real device->host round trip.
        float(loss)
        dt = time.time() - t0

    sps = iters / dt
    peak = PEAK_FLOPS.get(dtype)
    mfu = (flops * sps / peak) if (flops and peak) else None
    return TrainBenchResult(
        batch_size=batch_size,
        dtype=dtype,
        remat=remat,
        remat_policy=remat_policy if remat else "-",
        steps_per_sec=sps,
        windows_per_sec=sps * batch_size,
        flops_per_step=flops,
        mfu=mfu,
        compile_s=compile_s,
    )


def _fmt(r: TrainBenchResult) -> str:
    fl = f"{r.flops_per_step / 1e9:8.2f} GF" if r.flops_per_step else "     n/a"
    mfu = f"{100 * r.mfu:5.1f}%" if r.mfu is not None else "  n/a"
    return (
        f"B={r.batch_size:<5d} {r.dtype:<9s} remat={str(r.remat):<5s} "
        f"policy={r.remat_policy:<13s} "
        f"{r.steps_per_sec:7.1f} steps/s  {r.windows_per_sec:9,.0f} windows/s  "
        f"{fl}/step  MFU {mfu}  (compile {r.compile_s:.1f}s)"
    )


def main(argv=None) -> None:
    from mmtraj.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="float32", choices=("float32", "bfloat16"))
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--remat-policy", default="full",
                    choices=("full", "dots", "dots_no_batch"),
                    help="jax.checkpoint policy for the scan bodies")
    ap.add_argument("--unroll", type=int, default=1,
                    help="lax.scan unroll factor for the model's time loops")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--n-max", type=int, default=64,
                    help="padded agent capacity (128/256 = dense crowds)")
    ap.add_argument("--attend-kernel", default=None,
                    choices=("auto", "xla", "pallas"),
                    help="override ModelConfig.attend_kernel for A/B at dense N")
    ap.add_argument("--loss", default="nll", choices=("nll", "variety", "hybrid"),
                    help="objective to time (variety = the WTA quality recipe)")
    ap.add_argument("--variety-n", type=int, default=8,
                    help="rollout samples per step for --loss variety/hybrid")
    ap.add_argument("--encoder", default="rnn", choices=("rnn", "attn"),
                    help="observation-encoder family (ModelConfig.encoder)")
    ap.add_argument("--attn-layers", type=int, default=2,
                    help="transformer blocks when --encoder attn")
    ap.add_argument("--profile", default=None, help="write a jax.profiler trace here")
    ap.add_argument(
        "--sweep",
        action="store_true",
        help="batch x dtype x remat sweep (B=128..1024) instead of a single point",
    )
    ap.add_argument(
        "--policy-sweep",
        action="store_true",
        help="B x remat_policy sweep (remat=True, both dtypes) targeting the "
             "documented B>=256 recompute-traffic ceiling (ARCHITECTURE.md "
             "pt 9; VERDICT r2 #4)",
    )
    args = ap.parse_args(argv)
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}  n_max={args.n_max} obs=8 pred=12 "
          f"(config-4 model"
          + (f", attend_kernel={args.attend_kernel}" if args.attend_kernel else "")
          + ")")
    if args.policy_sweep:
        for batch in (128, 256, 512, 1024):
            for dtype in ("bfloat16", "float32"):
                for policy in ("full", "dots", "dots_no_batch"):
                    try:
                        r = bench_train_step(batch, dtype, True,
                                             iters=args.iters,
                                             unroll=args.unroll,
                                             remat_policy=policy)
                        print(_fmt(r), flush=True)
                    except Exception as e:
                        print(
                            f"B={batch:<5d} {dtype:<9s} policy={policy:<13s} "
                            f"FAILED: {type(e).__name__}: {str(e)[:120]}",
                            flush=True,
                        )
        return
    if args.sweep:
        for batch in (128, 256, 512, 1024):
            for dtype in ("float32", "bfloat16"):
                for remat in (True, False):
                    try:
                        r = bench_train_step(batch, dtype, remat,
                                             iters=args.iters, unroll=args.unroll)
                        print(_fmt(r), flush=True)
                    except Exception as e:  # e.g. OOM at B=1024 without remat
                        print(
                            f"B={batch:<5d} {dtype:<9s} remat={remat!s:<5s} "
                            f"FAILED: {type(e).__name__}: {str(e)[:120]}",
                            flush=True,
                        )
        return
    r = bench_train_step(
        args.batch, args.dtype, not args.no_remat, n_max=args.n_max,
        iters=args.iters, profile_dir=args.profile, unroll=args.unroll,
        remat_policy=args.remat_policy, attend_kernel=args.attend_kernel,
        loss_mode=args.loss, variety_n=args.variety_n,
        encoder=args.encoder, attn_layers=args.attn_layers,
    )
    print(_fmt(r))
    if args.profile:
        print(f"trace written to {args.profile}; summarize with:")
        print(f"  python -m mmtraj.cli profile-stats --trace-dir {args.profile}")


if __name__ == "__main__":
    main()

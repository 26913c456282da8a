"""Rollout benchmarks beyond the bench.py headline shape.

Two sweeps, both reproducing tables recorded in ARCHITECTURE.md pt 12 /
RESULTS.md "Dense-crowd rollout":

* ``--end-to-end`` — the full encode + K=20 sampled-rollout stack at a
  chosen graph size and attend backend (how the 71.8k-vs-27.6k N=128 and
  30.7k-vs-13.6k N=256 numbers were measured);
* ``--op-sweep``   — op-level attend chain (XLA `attend_math` vs the Pallas
  `attend_pallas` kernel) across (N, B_eff, group) — the dispatch-threshold
  evidence behind ``ModelConfig.attend_kernel="auto"``.

bench.py remains the driver-contract headline (N=64, one JSON line); this
module is the reproducibility surface for the dense-crowd claims.

Run:  python -m mmtraj.benchmarks.rollout_bench --end-to-end --n-max 128
      python -m mmtraj.benchmarks.rollout_bench --op-sweep
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from mmtraj.config import config4
from mmtraj.data.transforms import NormStats
from mmtraj.models.forecaster import Forecaster


def bench_rollout(n_max: int = 128, kernel: str = "auto", batch: int = 12,
                  k: int = 20, iters: int = 100, verbose: bool = True,
                  encoder: str = "rnn") -> float:
    """End-to-end window-rollouts/s at (n_max, kernel, batch); K folded in.

    ``encoder`` selects the observation-encoder family ("rnn" scan vs "attn"
    spatio-temporal attention) — the decoder/rollout program is identical, so
    the delta isolates the encode stage's share of the eval stack.
    """
    cfg = config4()
    mc = dataclasses.replace(cfg.model, scan_unroll=12, attend_kernel=kernel,
                             encoder=encoder)
    model = Forecaster(mc, cfg.data.obs_len, cfg.data.pred_len)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    rng = np.random.default_rng(0)
    steps = rng.normal(size=(batch, n_max, cfg.data.obs_len, 2)).astype(np.float32)
    xy_obs = jnp.asarray(np.cumsum(steps * 0.4, axis=2)
                         + rng.normal(size=(batch, n_max, 1, 2)) * 5)
    mask = jnp.asarray(rng.random((batch, n_max)) < 0.75)

    @jax.jit
    def many(p, x, m, key):
        keys = jax.random.split(key, iters)

        def body(c, kk):
            xk = x + jax.random.uniform(kk, (), jnp.float32, 0.0, 1e-6)
            return c + model.rollout_k(p, xk, m, stats, kk, k).mean(), None

        return jax.lax.scan(body, 0.0, keys)[0]

    t0 = time.time()
    float(many(params, xy_obs, mask, jax.random.PRNGKey(1)))
    compile_s = time.time() - t0
    times = []
    for trial in range(3):
        t0 = time.time()
        float(many(params, xy_obs, mask, jax.random.PRNGKey(trial)))
        times.append(time.time() - t0)
    rps = batch * k * iters / min(times)
    if verbose:
        print(f"kernel={kernel:6s} N={n_max} B={batch}: {rps:10,.0f} "
              f"window-rollouts/s (compile+first run {compile_s:.0f}s)",
              flush=True)
    return rps


def op_sweep(num_heads: int = 4, dh: int = 16, iters: int = 200) -> None:
    """XLA attend chain vs the Pallas kernel across (N, B_eff, group).

    Timing runs the op INSIDE one jitted ``lax.scan`` with every input
    perturbed per iteration and the full output consumed — the same
    methodology as bench.py.  Both halves matter behind the tunnel: naive
    ``block_until_ready`` loops return early here (>5x optimism, measured),
    and loop-invariant operands let XLA hoist the whole softmax chain out
    of the loop (the kernel, opaque to XLA, can't be hoisted — the round-3
    first-pass table was skewed exactly that way; ARCHITECTURE.md pt 12).
    """
    from mmtraj.ops.fused_attend import attend_math, attend_pallas

    def bench(fn, args):
        @jax.jit
        def many(v, ss, sd, att):
            def body(c, _):
                out = fn(v + c * 1e-9, ss + c * 1e-9, sd + c * 1e-9, att)
                return c + out.mean(), None
            return jax.lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

        float(many(*args))  # compile
        times = []
        for _ in range(3):
            t0 = time.time()
            float(many(*args))
            times.append(time.time() - t0)
        return min(times) / iters

    H = num_heads
    for N in (64, 128, 256):
        for B in (256, 512, 1280):
            rng = np.random.default_rng(0)
            v = jnp.asarray(rng.normal(size=(B, N, H * dh)).astype(np.float32))
            ss = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
            sd = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
            att = jnp.asarray((rng.random((B, N, N)) > 0.3).astype(np.float32))
            t_x = bench(lambda v, ss, sd, att: attend_math(v, ss, sd, att, H),
                        (v, ss, sd, att))
            line = f"N={N:4d} B={B:5d}  xla {t_x*1e6:9.1f} us"
            variants = [("G=4", 4, False), ("G=8", 8, False)] if N <= 128 \
                else [("G=2", 2, False), ("G=4", 4, False)]
            if 2 * N <= 128:
                variants.append(("G=8 packed", 8, True))
            for name, G, packed in variants:
                try:
                    t_p = bench(
                        lambda v, ss, sd, att, G=G, pk=packed:
                        attend_pallas(v, ss, sd, att, H, G, pk),
                        (v, ss, sd, att),
                    )
                    line += f" | {name} {t_x/t_p:4.2f}x"
                except Exception as e:
                    line += f" | {name} FAIL {type(e).__name__}"
            print(line, flush=True)


def main(argv=None) -> None:
    from mmtraj.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--end-to-end", action="store_true")
    ap.add_argument("--op-sweep", action="store_true")
    ap.add_argument("--n-max", type=int, default=128)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--kernel", default=None, choices=("auto", "xla", "pallas"),
                    help="end-to-end backend; default compares xla AND pallas")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--encoder", default="rnn", choices=("rnn", "attn"),
                    help="observation-encoder family for --end-to-end")
    args = ap.parse_args(argv)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    if args.op_sweep:
        op_sweep()
    if args.end_to_end or not args.op_sweep:
        kernels = (args.kernel,) if args.kernel else ("xla", "pallas")
        for kr in kernels:
            bench_rollout(args.n_max, kr, args.batch, args.k, args.iters,
                          encoder=args.encoder)


if __name__ == "__main__":
    main()

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
                  k: int = 20, iters: int = 100, verbose: bool = True) -> float:
    """End-to-end window-rollouts/s at (n_max, kernel, batch); K folded in."""
    cfg = config4()
    mc = dataclasses.replace(cfg.model, scan_unroll=12, attend_kernel=kernel)
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
              f"window-rollouts/s (compile {compile_s:.0f}s)", flush=True)
    return rps


def op_sweep(num_heads: int = 4, dh: int = 16, iters: int = 30) -> None:
    """XLA attend chain vs the Pallas kernel across (N, B_eff, group)."""
    from mmtraj.ops.fused_attend import attend_math, attend_pallas

    def bench(fn, args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / iters

    H = num_heads
    for N in (64, 128, 256):
        for B in (64, 256, 512, 1280):
            rng = np.random.default_rng(0)
            v = jnp.asarray(rng.normal(size=(B, N, H * dh)).astype(np.float32))
            ss = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
            sd = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
            att = jnp.asarray((rng.random((B, N, N)) > 0.3).astype(np.float32))
            t_x = bench(jax.jit(lambda v, ss, sd, att: attend_math(v, ss, sd, att, H)),
                        (v, ss, sd, att))
            line = f"N={N:4d} B={B:5d}  xla {t_x*1e6:9.1f} us"
            for G in (1, 2, 4, 8):
                try:
                    t_p = bench(
                        jax.jit(lambda v, ss, sd, att, G=G:
                                attend_pallas(v, ss, sd, att, H, G)),
                        (v, ss, sd, att),
                    )
                    line += f" | G={G} {t_x/t_p:4.2f}x"
                except Exception as e:
                    line += f" | G={G} FAIL {type(e).__name__}"
            print(line, flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--end-to-end", action="store_true")
    ap.add_argument("--op-sweep", action="store_true")
    ap.add_argument("--n-max", type=int, default=128)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--kernel", default=None, choices=("auto", "xla", "pallas"),
                    help="end-to-end backend; default compares xla AND pallas")
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args(argv)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    if args.op_sweep:
        op_sweep()
    if args.end_to_end or not args.op_sweep:
        kernels = (args.kernel,) if args.kernel else ("xla", "pallas")
        for kr in kernels:
            bench_rollout(args.n_max, kr, args.batch, args.k, args.iters)


if __name__ == "__main__":
    main()

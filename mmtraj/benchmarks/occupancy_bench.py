"""Occupancy-realistic throughput: the padding tax, measured (VERDICT r4 #1).

Every headline number in bench.py is quoted at ONE padded shape (N_max=64,
~75-80% mask occupancy).  Real ETH/UCY is bimodal: zara/eth/hotel windows
carry ~2-12 co-present agents while univ carries 30-50+ — so under a single
global N_max=64, a 6-agent zara window still pays the full 64^2 attend chain
and 64-row gate matmuls, and the quoted windows/s says nothing about the
throughput per *useful* agent a sparse workload sees.  This benchmark:

1. defines documented agent-count distributions (zara-sparse, univ-dense,
   5-scene mixed, plus the repo's own synthetic dataset's empirical counts);
2. measures the padded-N_max=64 eval stack on those workloads (windows/s is
   shape-constant; effective agent-trajectories/s collapses with sparsity);
3. measures the shape-bucketed execution (evaluate(buckets=...) routing:
   each window in the smallest compiled capacity of {16, 32, 64} that holds
   it) with two harnesses:
   - in-program scan rates per bucket shape (speed-of-light, same
     methodology as bench.py: ITERS folded into one lax.scan, hard sync),
     aggregated as total-windows / sum(windows_b / rate_b);
   - the REAL evaluate() wall clock on a WindowDataset with those counts —
     the deployed path, including routing and per-batch dispatch.

Metrics parity between the two paths is pinned separately
(tests/test_evaluate.py::test_bucketed_equals_padded); this file measures
only throughput.  Results table: RESULTS.md "Occupancy-aware execution".

Agent-count distributions (documented approximations of the public ETH/UCY
window statistics; the windower keeps agents present for the full 20 frames,
which thins raw per-frame counts):

  sparse  — Uniform{2..12}   (zara1/zara2/eth/hotel-like windows)
  dense   — Uniform{30..50}  (univ-like windows)
  mixed   — 80% sparse + 20% dense (4 sparse scenes : 1 dense scene)
  synthetic — empirical counts of the repo's 5-scene synthetic test split

Run:  python -m mmtraj.benchmarks.occupancy_bench [--iters 200]
      python -m mmtraj.benchmarks.occupancy_bench --evaluate-wall
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mmtraj.config import config4
from mmtraj.data.transforms import NormStats
from mmtraj.evaluate import vmem_friendly_batch
from mmtraj.models.forecaster import Forecaster

BUCKETS = (16, 32, 64)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def workload_counts(name: str, n_windows: int,
                    rng: np.random.Generator) -> np.ndarray:
    """Documented agent-count distributions (module docstring)."""
    if name == "sparse":
        return rng.integers(2, 13, n_windows)
    if name == "dense":
        return rng.integers(30, 51, n_windows)
    if name == "mixed":
        sparse = rng.integers(2, 13, n_windows)
        dense = rng.integers(30, 51, n_windows)
        return np.where(rng.random(n_windows) < 0.8, sparse, dense)
    if name == "synthetic":
        # Empirical: the synthetic 5-scene dataset's own window counts.
        import os
        import tempfile

        from mmtraj.data import load_split
        from mmtraj.data.synthetic import write_synthetic_dataset

        d = os.path.join(tempfile.gettempdir(), "mmtraj_occ_synth")
        if not os.path.isdir(d):
            write_synthetic_dataset(d, seed=0, n_frames=600)
        counts = []
        for scene in ("eth", "hotel", "univ", "zara1", "zara2"):
            _, test_w = load_split(d, scene, 8, 12)
            counts.extend(w.shape[0] for w in test_w)
        counts = np.asarray(counts)
        return counts[rng.integers(0, len(counts), n_windows)]
    raise ValueError(f"unknown workload {name!r}")


def _make_model():
    cfg = config4()
    mc = dataclasses.replace(cfg.model, use_pallas=False, scan_unroll=12)
    model = Forecaster(mc, cfg.data.obs_len, cfg.data.pred_len)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    return model, params, stats


def measure_rate(model, params, stats, n_cap: int, batch: int, k: int,
                 iters: int, counts: np.ndarray,
                 rng: np.random.Generator) -> float:
    """windows/s of the (batch, n_cap) eval program, bench.py methodology
    (iters folded into one lax.scan, scalar fetch = hard sync, best of 3).
    ``counts`` fills representative contiguous-prefix masks — throughput is
    shape-bound, but the masks keep the measurement honest."""
    To = model.obs_len
    steps = rng.normal(size=(batch, n_cap, To, 2)).astype(np.float32) * 0.4
    xy_obs = jnp.asarray(np.cumsum(steps, axis=2)
                         + rng.normal(size=(batch, n_cap, 1, 2)) * 5)
    c = counts[rng.integers(0, len(counts), batch)]
    mask = jnp.asarray(np.arange(n_cap)[None, :] < np.minimum(c, n_cap)[:, None])

    @jax.jit
    def many(p, x, m, key):
        keys = jax.random.split(key, iters)

        def body(carry, kk):
            xk = x + jax.random.uniform(kk, (), jnp.float32, 0.0, 1e-6)
            r = model.rollout_k(p, xk, m, stats, kk, k)
            return carry + r.mean(), None

        return jax.lax.scan(body, 0.0, keys)[0]

    t0 = time.time()
    float(many(params, xy_obs, mask, jax.random.PRNGKey(0)))
    log(f"    [N={n_cap} B={batch}] compile+first: {time.time() - t0:.1f}s")
    times = []
    for t in range(3):
        t0 = time.time()
        float(many(params, xy_obs, mask, jax.random.PRNGKey(t + 1)))
        times.append(time.time() - t0)
    return batch * iters / min(times)


def run_rates(iters: int, k: int = 20, n_windows: int = 4000) -> dict:
    """In-program-scan padded-vs-bucketed table for every workload."""
    model, params, stats = _make_model()
    rng = np.random.default_rng(0)
    # Per-shape rates are workload-independent (fixed shapes); measure once.
    rates = {}
    for n_cap in BUCKETS:
        b = vmem_friendly_batch(k, n_cap)
        rates[n_cap] = (b, measure_rate(model, params, stats, n_cap, b, k,
                                        iters, np.array([n_cap]), rng))
        log(f"  N={n_cap}: B={b} -> {rates[n_cap][1]:,.0f} windows/s")
    out = {}
    for wl in ("sparse", "mixed", "dense", "synthetic"):
        counts = np.minimum(workload_counts(wl, n_windows,
                                            np.random.default_rng(1)), 64)
        route = np.searchsorted(BUCKETS, counts, side="left")
        shares = np.bincount(route, minlength=len(BUCKETS)) / len(counts)
        mean_agents = counts.mean()
        padded_wps = rates[64][1]
        # Workload rate = total windows / sum of per-bucket time shares.
        bucket_time = sum(shares[i] / rates[nb][1]
                         for i, nb in enumerate(BUCKETS) if shares[i] > 0)
        bucketed_wps = 1.0 / bucket_time
        out[wl] = {
            "mean_agents": float(mean_agents),
            "shares": {int(nb): float(shares[i])
                       for i, nb in enumerate(BUCKETS)},
            "padded_wps": float(padded_wps),
            "bucketed_wps": float(bucketed_wps),
            "speedup": float(bucketed_wps / padded_wps),
            "padded_agent_tps": float(padded_wps * k * mean_agents),
            "bucketed_agent_tps": float(bucketed_wps * k * mean_agents),
        }
    return {"rates": {int(nb): {"batch": rates[nb][0],
                                "windows_per_sec": float(rates[nb][1])}
                      for nb in BUCKETS},
            "workloads": out}


def run_evaluate_wall(k: int = 20, n_windows: int = 1000) -> dict:
    """The deployed path: real evaluate() wall clock, padded vs bucketed,
    on WindowDatasets with the documented count distributions."""
    from mmtraj.data.collate import WindowDataset
    from mmtraj.evaluate import evaluate

    model, params, stats = _make_model()
    out = {}
    for wl in ("sparse", "mixed", "dense"):
        rng = np.random.default_rng(2)
        counts = np.minimum(workload_counts(wl, n_windows, rng), 64)
        windows = []
        for c in counts:
            steps = rng.normal(size=(int(c), 20, 2)).astype(np.float32) * 0.3
            windows.append(np.cumsum(steps, axis=1))
        ds = WindowDataset(windows, n_max=64)
        res = {}
        for mode, kw in (("padded", {}), ("bucketed", {"buckets": BUCKETS})):
            m0 = evaluate(model, params, stats, ds, k=k, seed=0, **kw)  # compile
            t0 = time.time()
            m1 = evaluate(model, params, stats, ds, k=k, seed=0, **kw)
            dt = time.time() - t0
            assert m0["min_ade"] == m1["min_ade"]
            res[mode] = {"wall_s": dt, "windows_per_sec": n_windows / dt,
                         "min_ade": m1["min_ade"]}
            log(f"  {wl}/{mode}: {dt:.2f}s ({n_windows / dt:,.0f} windows/s) "
                f"ade={m1['min_ade']:.6f}")
        # Metric parity: bit-equal on CPU (pinned by test) and measured
        # bit-equal on TPU at small shapes; at the flagship N=16/32/64
        # programs the per-bucket physical tilings drift ~1 f32 ulp (the
        # same caveat _eval_sums documents for batch-size changes on TPU),
        # so the gate here is a tight tolerance and the actual delta is
        # recorded in the output.
        d_ade = abs(res["padded"]["min_ade"] - res["bucketed"]["min_ade"])
        assert d_ade < 1e-5, f"bucketed ADE {d_ade} off padded — not a tiling ulp"
        res["ade_delta"] = d_ade
        res["speedup"] = (res["bucketed"]["windows_per_sec"]
                          / res["padded"]["windows_per_sec"])
        res["mean_agents"] = float(counts.mean())
        out[wl] = res
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--evaluate-wall", action="store_true",
                    help="also time the real evaluate() path (compiles the "
                         "bucketed programs; minutes cold, seconds cached)")
    args = ap.parse_args()
    import json

    from mmtraj.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    res = run_rates(args.iters, args.k)
    log("\nworkload        mean_N  padded w/s  bucketed w/s  speedup  "
        "padded agent-traj/s  bucketed agent-traj/s")
    for wl, r in res["workloads"].items():
        log(f"{wl:14s} {r['mean_agents']:7.1f} {r['padded_wps']:11,.0f} "
            f"{r['bucketed_wps']:13,.0f} {r['speedup']:8.2f} "
            f"{r['padded_agent_tps']:20,.0f} {r['bucketed_agent_tps']:22,.0f}")
    if args.evaluate_wall:
        res["evaluate_wall"] = run_evaluate_wall(args.k)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())

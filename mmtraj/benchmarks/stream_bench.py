"""Streaming-ingest benchmark: prefetch-to-HBM vs HBM-resident steps/s.

VERDICT r2 weak #3: the streaming path's stated purpose is "datasets that
outgrow HBM" (mmtraj/data/pipeline.py), but it had never met a dataset big
enough to stress it nor a measured TPU number.  This benchmark fabricates a
window set of arbitrary size (default ~20k windows at n_max=64 — ~400 MB of
padded host arrays, far beyond anything ETH/UCY-shaped) and times the exact
trainer ingest paths from mmtraj.train.fit:

* resident — DeviceDataset: whole set in HBM, per-step on-device gather;
* stream   — host-side WindowDataset.epoch_batches double-buffered through
  prefetch_to_device (pipeline.py), one batch in flight.

Both draw the same permutation stream, so the measured delta is pure ingest
overhead: if stream ~= resident at the flagship step rate, prefetch keeps up
and config-5's "streaming loader" (BASELINE.json:11) costs nothing; the
measured numbers live in RESULTS.md ("Streaming ingest at scale").

Run:  python -m mmtraj.benchmarks.stream_bench --windows 20000 --steps 200
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import numpy as np

from mmtraj.config import config4
from mmtraj.data.collate import WindowDataset
from mmtraj.data.pipeline import DeviceDataset, prefetch_to_device
from mmtraj.data.transforms import NormStats
from mmtraj.models.forecaster import Forecaster
from mmtraj.train import make_optimizer, make_train_step


def _fabricate_windows(n_windows: int, n_max: int, t_total: int = 20,
                       seed: int = 0):
    """Random-walk windows with univ-like variable agent counts."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_windows):
        n = int(rng.integers(max(1, n_max // 2), n_max + 1))
        steps = rng.normal(scale=0.15, size=(n, t_total, 2)).astype(np.float32)
        out.append(np.cumsum(steps, axis=1)
                   + rng.uniform(0, 12, size=(n, 1, 2)).astype(np.float32))
    return out


def bench_ingest(n_windows: int = 20000, batch_size: int = 256,
                 steps: int = 200, n_max: int = 64, dtype: str = "bfloat16",
                 seed: int = 0, prefetch: int = 2):
    """Returns {mode: steps_per_sec} for the identical train-step program."""
    cfg = config4()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, dtype=dtype),
        train=dataclasses.replace(cfg.train, batch_size=batch_size),
    )
    model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
    optimizer = make_optimizer(cfg)
    stats = NormStats(np.zeros(2, np.float32), np.ones(2, np.float32))

    t0 = time.time()
    windows = _fabricate_windows(n_windows, n_max, seed=seed)
    ds = WindowDataset(windows, n_max)
    gb = ds.xy.nbytes / 2**30
    print(f"fabricated {n_windows} windows (padded host set {gb:.2f} GiB) "
          f"in {time.time()-t0:.1f}s", flush=True)

    results = {}
    for mode in ("resident", "stream"):
        params = model.init(jax.random.PRNGKey(0))
        opt_state = optimizer.init(params)
        step_fn = make_train_step(model, optimizer, stats)
        rng = np.random.default_rng(seed)

        if mode == "resident":
            dds = DeviceDataset(ds)

            def batches():
                while True:
                    yield from (dds.batch(i)
                                for i in dds.epoch_indices(batch_size, rng))
        else:
            def batches():
                def host():
                    while True:
                        yield from ds.epoch_batches(batch_size, rng)
                return prefetch_to_device(host(), size=prefetch)

        it = iter(batches()) if mode == "resident" else batches()
        # Warmup: compile + fill the prefetch queue.
        for _ in range(3):
            xy, mask = next(it)
            params, opt_state, loss = step_fn(params, opt_state, xy, mask)
        float(loss)  # hard sync before the timed window
        t0 = time.time()
        for _ in range(steps):
            xy, mask = next(it)
            params, opt_state, loss = step_fn(params, opt_state, xy, mask)
        float(loss)  # hard sync: tunnel block_until_ready returns ~1 step early
        dt = time.time() - t0
        if mode == "stream":
            it.close()  # release the producer thread + queued buffers
        del it
        sps = steps / dt
        results[mode] = sps
        depth = f" prefetch={prefetch}" if mode == "stream" else ""
        print(f"{mode:9s}{depth} B={batch_size} n_max={n_max} {dtype}: "
              f"{sps:7.2f} steps/s  ({sps * batch_size:9,.0f} windows/s)",
              flush=True)
    ratio = results["stream"] / results["resident"]
    print(f"stream/resident throughput ratio: {ratio:.3f}", flush=True)
    return results


def main(argv=None) -> None:
    from mmtraj.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--windows", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--n-max", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--prefetch", type=int, default=2,
                    help="prefetch queue depth for the stream path")
    args = ap.parse_args(argv)
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")
    bench_ingest(args.windows, args.batch, args.steps, args.n_max,
                 args.dtype, prefetch=args.prefetch)


if __name__ == "__main__":
    main()

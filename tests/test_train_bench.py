"""Training-step microbenchmark harness sanity (mmtraj/benchmarks/train_bench.py)."""

import pytest

from mmtraj.benchmarks.train_bench import bench_train_step

pytestmark = pytest.mark.slow  # compiles the full train step


def test_bench_train_step_runs_and_reports():
    r = bench_train_step(batch_size=2, n_max=16, iters=2, warmup=1, min_seconds=0)
    assert r.steps_per_sec > 0
    assert r.windows_per_sec == pytest.approx(2 * r.steps_per_sec)
    # XLA's cost model should count a positive FLOP total for a fwd+bwd+
    # optimizer program (None only if cost_analysis is unavailable).
    if r.flops_per_step is not None:
        assert r.flops_per_step > 1e6
        assert r.mfu is not None and 0 < r.mfu < 1


def test_bench_bf16_and_no_remat_compile():
    r = bench_train_step(batch_size=2, n_max=16, iters=1, warmup=0, min_seconds=0,
                         dtype="bfloat16", remat=False)
    assert r.steps_per_sec > 0


def test_bench_remat_policy_variants_compile():
    for policy in ("dots", "dots_no_batch"):
        r = bench_train_step(batch_size=2, n_max=16, iters=1, warmup=0, min_seconds=0,
                             remat_policy=policy)
        assert r.steps_per_sec > 0 and r.remat_policy == policy


def test_bench_attn_encoder_compiles():
    r = bench_train_step(batch_size=2, n_max=16, iters=1, warmup=0, min_seconds=0,
                         encoder="attn", attn_layers=1)
    assert r.steps_per_sec > 0


def test_stream_bench_runs_and_reports_both_modes():
    from mmtraj.benchmarks.stream_bench import bench_ingest

    res = bench_ingest(n_windows=120, batch_size=8, steps=4, n_max=12,
                       dtype="float32")
    assert set(res) == {"resident", "stream"}
    assert all(v > 0 for v in res.values())


def test_serve_bench_exports_and_measures():
    import dataclasses

    import jax
    import numpy as np

    from mmtraj.benchmarks.serve_bench import bench_one
    from mmtraj.config import get_config
    from mmtraj.data.transforms import NormStats
    from mmtraj.models.forecaster import Forecaster

    cfg = get_config("4")
    mcfg = dataclasses.replace(cfg.model, hidden_dim=16, embed_dim=8)
    model = Forecaster(mcfg, cfg.data.obs_len, cfg.data.pred_len)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    row = bench_one(model, params, stats, batch=2, n=8, k=2, oversample=1,
                    iters=2, scan_iters=2)
    assert row["artifact_mb"] > 0
    assert row["e2e_p50_ms"] > 0 and row["e2e_p95_ms"] >= row["e2e_p50_ms"]
    assert row["device_windows_per_s"] > 0


def test_serve_loop_bench_measures_aggregation():
    import dataclasses

    import jax
    import numpy as np

    from mmtraj.benchmarks.serve_bench import bench_serve_loop
    from mmtraj.config import get_config
    from mmtraj.data.transforms import NormStats
    from mmtraj.models.forecaster import Forecaster

    cfg = get_config("4")
    mcfg = dataclasses.replace(cfg.model, hidden_dim=16, embed_dim=8)
    model = Forecaster(mcfg, cfg.data.obs_len, cfg.data.pred_len)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    rows = bench_serve_loop(model, params, stats, n=18, k=2, n_requests=4,
                            aggregates=[1, 2])
    assert [r["aggregate"] for r in rows] == [1, 2]
    assert all(r["requests_per_s"] > 0 for r in rows)


def test_rollout_bench_end_to_end_smoke():
    from mmtraj.benchmarks.rollout_bench import bench_rollout

    rps = bench_rollout(n_max=8, kernel="xla", batch=2, k=2, iters=2,
                        verbose=False)
    assert rps > 0

"""Training-step microbenchmark harness sanity (mmtraj/benchmarks/train_bench.py)."""

import pytest

from mmtraj.benchmarks.train_bench import bench_train_step

pytestmark = pytest.mark.slow  # compiles the full train step


def test_bench_train_step_runs_and_reports():
    r = bench_train_step(batch_size=2, n_max=16, iters=2, warmup=1)
    assert r.steps_per_sec > 0
    assert r.windows_per_sec == pytest.approx(2 * r.steps_per_sec)
    # XLA's cost model should count a positive FLOP total for a fwd+bwd+
    # optimizer program (None only if cost_analysis is unavailable).
    if r.flops_per_step is not None:
        assert r.flops_per_step > 1e6
        assert r.mfu is not None and 0 < r.mfu < 1


def test_bench_bf16_and_no_remat_compile():
    r = bench_train_step(batch_size=2, n_max=16, iters=1, warmup=0,
                         dtype="bfloat16", remat=False)
    assert r.steps_per_sec > 0


def test_bench_remat_policy_variants_compile():
    for policy in ("dots", "dots_no_batch"):
        r = bench_train_step(batch_size=2, n_max=16, iters=1, warmup=0,
                             remat_policy=policy)
        assert r.steps_per_sec > 0 and r.remat_policy == policy


def test_stream_bench_runs_and_reports_both_modes():
    from mmtraj.benchmarks.stream_bench import bench_ingest

    res = bench_ingest(n_windows=120, batch_size=8, steps=4, n_max=12,
                       dtype="float32")
    assert set(res) == {"resident", "stream"}
    assert all(v > 0 for v in res.values())


def test_rollout_bench_end_to_end_smoke():
    from mmtraj.benchmarks.rollout_bench import bench_rollout

    rps = bench_rollout(n_max=8, kernel="xla", batch=2, k=2, iters=2,
                        verbose=False)
    assert rps > 0

"""Profiling/debug utility tests (SURVEY.md §5)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtraj.utils.profiling import annotate, assert_finite_tree, trace_ctx


def test_trace_ctx_writes_profile(tmp_path):
    out = str(tmp_path / "run")
    with trace_ctx(out, enabled=True):
        with annotate("test-region"):
            jnp.ones((8, 8)).sum().block_until_ready()
    files = glob.glob(os.path.join(out, "profile", "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files)


def test_trace_ctx_disabled_writes_nothing(tmp_path):
    out = str(tmp_path / "run2")
    with trace_ctx(out, enabled=False):
        jnp.ones(4).sum().block_until_ready()
    assert not os.path.exists(os.path.join(out, "profile"))


def test_assert_finite_tree():
    assert_finite_tree({"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}})
    with pytest.raises(AssertionError):
        assert_finite_tree({"a": jnp.array([1.0, np.nan])})


def test_metrics_logger_tensorboard(tmp_path):
    """tensorboard=True mirrors float metrics as TB event files."""
    from mmtraj.utils.logging import MetricsLogger

    lg = MetricsLogger(str(tmp_path), quiet=True, tensorboard=True)
    lg.log(1, loss=0.5)
    lg.log(2, loss=0.25, event="checkpoint")  # non-float values skipped
    lg.close()
    import glob

    assert glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    import json

    recs = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    assert recs[0]["loss"] == 0.5 and recs[1]["event"] == "checkpoint"


def test_summarize_trace_on_cpu_capture(tmp_path):
    """Capture a tiny CPU trace via trace_ctx and parse it offline."""
    import jax
    import jax.numpy as jnp

    from mmtraj.utils.profiling import summarize_trace, trace_ctx

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((256, 256))
    float(f(x))
    with trace_ctx(str(tmp_path), enabled=True):
        float(f(x))
    by_cat, rows = summarize_trace(str(tmp_path / "profile"))
    if by_cat is None:  # xprof not installed in this env
        import pytest

        pytest.skip("xprof unavailable")
    # CPU xplanes often carry no device-HLO rows (hlo_stats is a device
    # tool); the parse itself succeeding with well-formed output is the
    # contract here — content is exercised on real TPU traces.
    assert isinstance(by_cat, dict)
    assert all(len(r) == 4 for r in rows)

"""Profiling/debug utility tests (SURVEY.md §5).

The trace capture/parse pair runs in ONE fresh subprocess, deliberately:
`jax.profiler.stop_trace` serializes metadata for every executable the
process has ever compiled, so inside the full suite (hundreds of compiled
programs by the time this file runs alphabetically) the same two tests that
take <1 s in a clean process ballooned to 295 s + 191 s (measured, round 3).
Subprocess isolation pins the utility's behavior without paying for the
suite's compile history.
"""

import glob
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from mmtraj.utils.profiling import assert_finite_tree, trace_ctx

_TRACE_WORKER = r"""
import glob, os, sys, tempfile
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[1])
import jax.numpy as jnp
from mmtraj.utils.profiling import annotate, summarize_trace, trace_ctx

out = tempfile.mkdtemp()
f = jax.jit(lambda x: (x @ x).sum())
x = jnp.ones((256, 256))
float(f(x))
with trace_ctx(out, enabled=True):
    with annotate("test-region"):
        float(f(x))
files = glob.glob(os.path.join(out, "profile", "**", "*"), recursive=True)
assert any(os.path.isfile(p) for p in files), "trace wrote no files"
print("TRACE_OK", flush=True)

by_cat, rows = summarize_trace(os.path.join(out, "profile"))
if by_cat is None:
    print("XPROF_UNAVAILABLE", flush=True)
else:
    # CPU xplanes often carry no device-HLO rows (hlo_stats is a device
    # tool); the parse succeeding with well-formed output is the contract
    # here — content is exercised on real TPU traces.
    assert isinstance(by_cat, dict)
    assert all(len(r) == 4 for r in rows)
    print("SUMMARIZE_OK", flush=True)
"""


@pytest.mark.slow
def test_trace_capture_and_summarize_in_fresh_process(tmp_path):
    """trace_ctx writes an openable profile and summarize_trace parses it."""
    worker = tmp_path / "trace_worker.py"
    worker.write_text(_TRACE_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, str(worker), repo],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "TRACE_OK" in out.stdout
    if "XPROF_UNAVAILABLE" in out.stdout:
        pytest.skip("xprof unavailable")
    assert "SUMMARIZE_OK" in out.stdout


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

    assert glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    import json

    recs = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    assert recs[0]["loss"] == 0.5 and recs[1]["event"] == "checkpoint"


def test_metrics_logger_array_metric_does_not_crash(tmp_path):
    """ndarrays expose __float__ at any size (raising for size != 1); the
    logger must record them as lists, not crash the training loop."""
    import json

    from mmtraj.utils.logging import MetricsLogger

    lg = MetricsLogger(str(tmp_path), quiet=True)
    lg.log(1, per_k=np.array([0.5, 0.75]), loss=np.float32(0.25))
    lg.close()
    recs = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    assert recs[0]["per_k"] == [0.5, 0.75] and recs[0]["loss"] == 0.25


def test_assert_finite_tree_names_label_and_leaf():
    with pytest.raises(AssertionError, match="grads"):
        assert_finite_tree({"dense": {"w": jnp.array([1.0, np.nan])}},
                           label="grads")

"""Hot-program fingerprints (VERDICT r3 next-round #5; SURVEY.md §4
"Performance regression").

The 180k window-rollouts/s headline is once-per-round and tunnel-noisy; these
tests pin the *programs* instead, so a refactor that perturbs them fails in
seconds without timing.  Two pins per program, both computed from the
platform-independent StableHLO lowering (no compile, no timing):

  1. op-category counts — catches structural drift (a reintroduced
     while-loop where the bench program is fully unrolled, an extra
     transpose chain, a changed kernel-dispatch decision);
  2. lowered-cost-analysis FLOPs — catches shape/dtype/width drift even
     when the op mix is unchanged.

Update protocol (INTENTIONAL program changes only): run
`python tests/test_program_fingerprint.py` — it prints the current
fingerprint dicts — paste them over the EXPECTED_* constants below, and
record WHY in the commit message.  A jax upgrade that shifts lowering also
legitimately re-pins (the counts are lowering-version-dependent; flops are
not expected to move).
"""

import collections
import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np

from mmtraj.config import get_config
from mmtraj.data.transforms import NormStats
from mmtraj.models.forecaster import Forecaster
from mmtraj.train import make_optimizer, make_train_step

# Ops whose counts are load-bearing for the hot programs: matmuls (MXU
# work), loops (the bench program must stay fully unrolled: 3 whiles — the
# K-key split fori and two RNG-internal loops — not 5), control flow,
# communication-shaped ops.  Elementwise counts are deliberately NOT pinned
# (they shift with harmless algebraic refactors and jax point releases).
PINNED_OPS = ("dot_general", "while", "reduce", "sort", "gather",
              "scatter", "dynamic_slice", "dynamic_update_slice")

# Flagship eval program: config-4 rollout_k at the bench.py shapes
# (B=25, N=64, K=20, full unroll).  BENCH_r03: 179,940 rollouts/s/chip.
EXPECTED_EVAL = {
    "dot_general": 27, "while": 3, "reduce": 19, "sort": 0, "gather": 0,
    "scatter": 0, "dynamic_slice": 1, "dynamic_update_slice": 0,
}
EXPECTED_EVAL_GFLOPS = 33.487

# Flagship train program: config-4 jitted step (nll, no EMA/augment) at the
# preset batch size.
EXPECTED_TRAIN = {
    "dot_general": 91, "while": 4, "reduce": 140, "sort": 0, "gather": 0,
    "scatter": 0, "dynamic_slice": 14, "dynamic_update_slice": 6,
}
EXPECTED_TRAIN_GFLOPS = 0.68


def _fingerprint(lowered):
    txt = lowered.as_text()
    ops = collections.Counter(
        m.group(1) for m in re.finditer(r"stablehlo\.([a-z_]+)", txt))
    counts = {k: ops.get(k, 0) for k in PINNED_OPS}
    gflops = round(lowered.cost_analysis()["flops"] / 1e9, 3)
    return counts, gflops


def _eval_lowered():
    cfg = get_config("4")
    mc = dataclasses.replace(cfg.model, use_pallas=False, scan_unroll=12)
    B, N = 25, cfg.data.n_max
    model = Forecaster(mc, cfg.data.obs_len, cfg.data.pred_len)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    xy = jnp.zeros((B, N, cfg.data.obs_len, 2))
    mask = jnp.ones((B, N), bool)
    return jax.jit(
        lambda p, x, m, k: model.rollout_k(p, x, m, stats, k, 20)
    ).lower(params, xy, mask, jax.random.PRNGKey(0))


def _train_lowered():
    cfg = get_config("4")
    model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(model, opt, stats)
    B, N = cfg.train.batch_size, cfg.data.n_max
    T = cfg.data.obs_len + cfg.data.pred_len
    xy = jnp.zeros((B, N, T, 2))
    mask = jnp.ones((B, N), bool)
    return jax.jit(step.__wrapped__ if hasattr(step, "__wrapped__") else step
                   ).lower(params, opt_state, xy, mask)


def test_eval_program_fingerprint():
    counts, gflops = _fingerprint(_eval_lowered())
    assert counts == EXPECTED_EVAL, (
        f"flagship EVAL program drifted: {counts} != {EXPECTED_EVAL}. If "
        f"intentional, re-pin per the module docstring and re-run bench.py.")
    assert abs(gflops - EXPECTED_EVAL_GFLOPS) < 0.001 * EXPECTED_EVAL_GFLOPS, (
        f"flagship EVAL program FLOPs drifted: {gflops} vs "
        f"{EXPECTED_EVAL_GFLOPS} GF")


def test_train_program_fingerprint():
    counts, gflops = _fingerprint(_train_lowered())
    assert counts == EXPECTED_TRAIN, (
        f"flagship TRAIN program drifted: {counts} != {EXPECTED_TRAIN}. If "
        f"intentional, re-pin per the module docstring.")
    assert abs(gflops - EXPECTED_TRAIN_GFLOPS) < 0.001 * EXPECTED_TRAIN_GFLOPS, (
        f"flagship TRAIN program FLOPs drifted: {gflops} vs "
        f"{EXPECTED_TRAIN_GFLOPS} GF")


def test_fingerprint_is_sensitive():
    """The pin must actually move when the program regresses: flipping the
    bench unroll back to while-loops (the exact regression the 168k->180k
    win guards against) must change the pinned counts."""
    cfg = get_config("4")
    mc = dataclasses.replace(cfg.model, use_pallas=False, scan_unroll=1)
    B, N = 25, cfg.data.n_max
    model = Forecaster(mc, cfg.data.obs_len, cfg.data.pred_len)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.full(2, 0.4, np.float32))
    xy = jnp.zeros((B, N, cfg.data.obs_len, 2))
    mask = jnp.ones((B, N), bool)
    low = jax.jit(
        lambda p, x, m, k: model.rollout_k(p, x, m, stats, k, 20)
    ).lower(params, xy, mask, jax.random.PRNGKey(0))
    counts, _ = _fingerprint(low)
    assert counts != EXPECTED_EVAL
    assert counts["while"] > EXPECTED_EVAL["while"]


if __name__ == "__main__":
    # Re-pin helper: prints the current fingerprints in paste-able form.
    jax.config.update("jax_platforms", "cpu")
    for name, fn in (("EVAL", _eval_lowered), ("TRAIN", _train_lowered)):
        counts, gflops = _fingerprint(fn())
        print(f"EXPECTED_{name} = {counts}")
        print(f"EXPECTED_{name}_GFLOPS = {gflops}")

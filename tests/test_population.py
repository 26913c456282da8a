"""Population training (mmtraj/population.py): vmap the train step over
seeds — each lane must reproduce its sequential `fit` run.

The seed sweep is the repo's unit of quality work (5-seed mean±std tables,
per-seed ensemble pooling), so lane-equivalence to sequential training is
the whole contract: same per-seed init, (seed, epoch) data streams,
fold_in(base_key, step) RNG, optimizer/EMA math.
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from mmtraj import checkpoint as ckpt_lib
from mmtraj.config import get_config
from mmtraj.population import fit_population
from mmtraj.train import fit

pytestmark = pytest.mark.slow  # scan-heavy; quick subset: -m "not slow"


def _cfg(synth_dir, tmp_path, out, steps=21, **train_kw):
    cfg = get_config("3")
    data = dataclasses.replace(cfg.data, data_dir=synth_dir,
                               obs_len=4, pred_len=3, n_max=12)
    train = dataclasses.replace(
        cfg.train, steps=steps, batch_size=8, eval_every=0, log_every=5,
        k_samples=3, out_dir=str(tmp_path / out), **train_kw,
    )
    return cfg.replace(data=data, train=train)


def _assert_lane_matches(pop_result, seq_result, what):
    assert [s for s, _ in pop_result.history] == [
        s for s, _ in seq_result.history]
    for (s, a), (_, b) in zip(pop_result.history, seq_result.history):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5,
                                   err_msg=f"{what}: loss diverged at {s}")
    for a, b in zip(jax.tree.leaves(pop_result.params),
                    jax.tree.leaves(seq_result.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5, err_msg=what)


def test_population_matches_sequential_full_rng_surface(synth_dir, tmp_path):
    """2-seed population == 2 sequential runs, with the full RNG surface on
    (augment rotate+flip, dropout, variety WTA draws, EMA) and multi-step
    dispatch chunking (21 = 3*7 steps at spd=7).  vmap batches the same ops
    per lane rather than reassociating them, so tolerances match the
    multi-step-dispatch equivalence test's."""
    seeds = [0, 3]
    cfg = _cfg(synth_dir, tmp_path, "pop", loss="variety", variety_n=2,
               augment_rotate=True, augment_flip=True, ema_decay=0.99,
               steps_per_dispatch=7)
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, dropout=0.1))
    pop = fit_population(cfg, seeds)
    for seed, pr in zip(seeds, pop):
        seq_cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, seed=seed, steps_per_dispatch=1,
            out_dir=str(tmp_path / f"seq{seed}")))
        sr = fit(seq_cfg)
        _assert_lane_matches(pr, sr, f"seed {seed}")
        # Final eval ran per seed with the sequential eval seed/protocol.
        assert pr.eval_metrics.keys() == sr.eval_metrics.keys()
        np.testing.assert_allclose(pr.eval_metrics["min_ade"],
                                   sr.eval_metrics["min_ade"],
                                   rtol=1e-3, atol=1e-4)


def test_population_tree_layout_and_checkpoints(synth_dir, tmp_path):
    """Writes the s{seed}/ tree the sequential multi-seed driver writes:
    per-seed configs carry that seed, checkpoints load and eval."""
    seeds = [1, 4]
    cfg = _cfg(synth_dir, tmp_path, "tree", steps=10, ema_decay=0.99,
               steps_per_dispatch=5)
    results = fit_population(cfg, seeds)
    for seed, r in zip(seeds, results):
        for name in ("checkpoint.npz", "checkpoint_ema.npz"):
            path = os.path.join(str(tmp_path / "tree"), f"s{seed}", name)
            assert os.path.exists(path), path
            ck = ckpt_lib.load(path)
            assert ck.config.train.seed == seed
            assert ck.step == 10
        # EMA params in the result match the EMA checkpoint bit-exactly.
        ck = ckpt_lib.load(
            os.path.join(str(tmp_path / "tree"), f"s{seed}", "checkpoint_ema.npz"))
        for a, b in zip(jax.tree.leaves(ck.params), jax.tree.leaves(r.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_population_data_parallel(synth_dir, tmp_path):
    """Population x DP composes (VERDICT r3 next-round #6): the same 2-seed
    population trained with the per-seed batch axis sharded over the virtual
    8-device mesh must match the single-device population program — vmap
    inside pjit, gather partitioned, grad all-reduce derived from shardings.
    Full RNG surface on, so the sharded program replays the exact streams."""
    seeds = [0, 3]
    kw = dict(loss="variety", variety_n=2, augment_rotate=True,
              augment_flip=True, ema_decay=0.99, steps_per_dispatch=7)
    cfg1 = _cfg(synth_dir, tmp_path, "pop1", **kw)
    cfg1 = cfg1.replace(model=dataclasses.replace(cfg1.model, dropout=0.1))
    single = fit_population(cfg1, seeds)
    cfg8 = _cfg(synth_dir, tmp_path, "pop8", data_parallel=True, **kw)
    cfg8 = cfg8.replace(model=dataclasses.replace(cfg8.model, dropout=0.1))
    sharded = fit_population(cfg8, seeds)
    for seed, a, b in zip(seeds, single, sharded):
        _assert_lane_matches(a, b, f"dp-vs-single seed {seed}")


def test_population_guards(synth_dir, tmp_path):
    cfg = _cfg(synth_dir, tmp_path, "g", steps=4)
    with pytest.raises(ValueError, match="resident"):
        fit_population(
            cfg.replace(train=dataclasses.replace(cfg.train, stream=True)),
            [0, 1])
    with pytest.raises(ValueError, match="divisible"):
        fit_population(
            cfg.replace(train=dataclasses.replace(
                cfg.train, data_parallel=True, batch_size=9)), [0, 1])
    with pytest.raises(ValueError, match="duplicate"):
        fit_population(cfg, [2, 2])
    with pytest.raises(ValueError, match="align"):
        fit_population(cfg, [0, 1], out_dirs=["x"])

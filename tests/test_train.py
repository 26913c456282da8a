"""Training-loop integration tests (SURVEY.md §4).

Overfit-to-near-zero on one synthetic scene (config-1 model), loss-descends
smoke per ladder config, checkpoint save->load->bit-identical eval.
"""

import json
import os

import jax
import numpy as np
import pytest

from mmtraj import checkpoint as ckpt_lib
from mmtraj.config import get_config
from mmtraj.data.collate import WindowDataset
from mmtraj.data.registry import load_scene_windows
from mmtraj.evaluate import evaluate
from mmtraj.models.forecaster import Forecaster
from mmtraj.train import fit


pytestmark = pytest.mark.slow  # scan-heavy; quick subset: -m "not slow"


def _quick_cfg(preset, synth_dir, tmp_path, steps=60, **data_kw):
    import dataclasses

    cfg = get_config(preset)
    data = dataclasses.replace(cfg.data, data_dir=synth_dir, **data_kw)
    train = dataclasses.replace(
        cfg.train,
        steps=steps,
        batch_size=16,
        eval_every=0,
        log_every=50,
        k_samples=3,
        out_dir=str(tmp_path / f"run{preset}"),
    )
    return cfg.replace(data=data, train=train)


@pytest.mark.parametrize("preset", ["1", "2", "3", "4"])
def test_loss_descends_per_config(preset, synth_dir, tmp_path):
    cfg = _quick_cfg(preset, synth_dir, tmp_path, steps=60)
    if preset == "4":  # dense scene is big; shrink for CI speed
        import dataclasses

        cfg = cfg.replace(data=dataclasses.replace(cfg.data, scene="zara2", n_max=24))
    result = fit(cfg)
    first = result.history[0][1]
    last = result.history[-1][1]
    assert np.isfinite(last)
    assert last < first, f"loss did not descend: {first} -> {last}"


def test_overfit_single_scene(synth_dir, tmp_path):
    """Config-1 model overfits a small window set to near-zero MSE."""
    cfg = _quick_cfg("1", synth_dir, tmp_path, steps=400)
    result = fit(cfg)
    assert result.history[-1][1] < 0.25, f"failed to overfit: {result.history[-3:]}"


def test_metrics_jsonl_written(synth_dir, tmp_path):
    cfg = _quick_cfg("2", synth_dir, tmp_path, steps=30)
    fit(cfg)
    path = os.path.join(cfg.train.out_dir, "metrics.jsonl")
    records = [json.loads(line) for line in open(path)]
    assert any("loss" in r for r in records)
    assert any(r.get("event") == "checkpoint" for r in records)


def test_checkpoint_roundtrip_bit_identical_eval(synth_dir, tmp_path):
    cfg = _quick_cfg("3", synth_dir, tmp_path, steps=30)
    result = fit(cfg)

    path = os.path.join(cfg.train.out_dir, "checkpoint.npz")
    ck = ckpt_lib.load(path)
    params, stats, step = ck.params, ck.stats, ck.step
    assert step == 30
    assert ck.opt_leaves is not None  # resume-capable
    for a, b in zip(jax.tree.leaves(result.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    windows = load_scene_windows(synth_dir, cfg.data.scene, 8, 12)
    ds = WindowDataset(windows[:32], cfg.data.n_max)
    model = Forecaster(cfg.model, 8, 12)
    m1 = evaluate(model, result.params, result.stats, ds, k=3, batch_size=16)
    m2 = evaluate(model, params, stats, ds, k=3, batch_size=16)
    assert m1["min_ade"] == m2["min_ade"] and m1["min_fde"] == m2["min_fde"]


def test_orbax_checkpoint_roundtrip(synth_dir, tmp_path):
    cfg = _quick_cfg("2", synth_dir, tmp_path, steps=5)
    result = fit(cfg)
    path = str(tmp_path / "orbax_ckpt")
    ckpt_lib.save(path, result.params, result.stats, cfg, 5)
    ck = ckpt_lib.load(path)
    assert ck.step == 5 and ck.config.model == cfg.model
    for a, b in zip(jax.tree.leaves(result.params), jax.tree.leaves(ck.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_and_h5_interchange_roundtrip(synth_dir, tmp_path):
    """The torch .pt and HDF5 .h5 interchange adapters (SURVEY.md §5: the
    reference's format is one of these) round-trip params/stats/config
    exactly through the sniffing save/load front door."""
    cfg = _quick_cfg("2", synth_dir, tmp_path, steps=5)
    result = fit(cfg)
    for fname in ("ck.pt", "ck.h5"):
        path = str(tmp_path / fname)
        ckpt_lib.save(path, result.params, result.stats, cfg, 5)
        ck = ckpt_lib.load(path)
        assert ck.step == 5 and ck.config.model == cfg.model
        for a, b in zip(jax.tree.leaves(result.params), jax.tree.leaves(ck.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(ck.stats.mean), np.asarray(result.stats.mean))


def test_resume_continues_from_checkpoint(synth_dir, tmp_path):
    """Train 40 steps with periodic ckpt, kill, resume to 80; the resumed run
    must pick up params + optimizer state + step."""
    import dataclasses

    cfg = _quick_cfg("2", synth_dir, tmp_path, steps=40)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, ckpt_every=20, log_every=20))
    r1 = fit(cfg)
    assert r1.history[-1][0] == 40

    cfg2 = cfg.replace(
        train=dataclasses.replace(cfg.train, steps=80, ckpt_every=20, log_every=20)
    )
    r2 = fit(cfg2, resume=True)
    steps_logged = [s for s, _ in r2.history]
    assert steps_logged[0] > 40  # continued, not restarted
    assert steps_logged[-1] == 80
    ck = ckpt_lib.load(os.path.join(cfg.train.out_dir, "checkpoint.npz"))
    assert ck.step == 80


def test_cosine_schedule_descends(synth_dir, tmp_path):
    """lr_schedule='cosine' trains and descends like constant."""
    import dataclasses as dc

    cfg = _quick_cfg("2", synth_dir, tmp_path, steps=60)
    cfg = cfg.replace(
        train=dc.replace(cfg.train, lr_schedule="cosine", warmup_steps=10, log_every=20)
    )
    result = fit(cfg)
    assert result.history[-1][1] < result.history[0][1]
    assert np.isfinite(result.history[-1][1])


def test_ema_training(synth_dir, tmp_path):
    """ema_decay>0: loss descends, EMA checkpoint written, returned params
    are the EMA (differ from the raw resume checkpoint's params)."""
    import dataclasses as dc

    cfg = _quick_cfg("2", synth_dir, tmp_path, steps=40)
    cfg = cfg.replace(train=dc.replace(cfg.train, ema_decay=0.99, log_every=10))
    result = fit(cfg)
    assert result.history[-1][1] < result.history[0][1]
    ema_path = os.path.join(cfg.train.out_dir, "checkpoint_ema.npz")
    raw = ckpt_lib.load(os.path.join(cfg.train.out_dir, "checkpoint.npz"))
    ema = ckpt_lib.load(ema_path)
    # EMA lags the raw weights
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(raw.params), jax.tree.leaves(ema.params))
    ]
    assert max(diffs) > 0.0
    # result.params are the EMA weights
    for a, b in zip(jax.tree.leaves(result.params), jax.tree.leaves(ema.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_ema_training_data_parallel(synth_dir, tmp_path):
    """EMA composes with the mesh path (replicated EMA state)."""
    import dataclasses as dc

    cfg = _quick_cfg("2", synth_dir, tmp_path, steps=16)
    cfg = cfg.replace(
        train=dc.replace(cfg.train, ema_decay=0.99, data_parallel=True, log_every=8)
    )
    result = fit(cfg)
    assert np.isfinite(result.history[-1][1])


def test_ema_survives_resume(synth_dir, tmp_path):
    """Periodic checkpoints include the EMA and resume restores it (a
    kill+resume used to silently reset the EMA to the raw weights)."""
    import dataclasses as dc

    cfg = _quick_cfg("2", synth_dir, tmp_path, steps=20)
    cfg = cfg.replace(
        train=dc.replace(cfg.train, ema_decay=0.99, ckpt_every=10, log_every=10)
    )
    fit(cfg)
    ema_path = os.path.join(cfg.train.out_dir, "checkpoint_ema.npz")
    ema_at_20 = ckpt_lib.load(ema_path)
    assert ema_at_20.step == 20

    cfg2 = cfg.replace(
        train=dc.replace(cfg.train, steps=40, ema_decay=0.99, ckpt_every=10,
                         log_every=10)
    )
    r2 = fit(cfg2, resume=True)
    ema_at_40 = ckpt_lib.load(ema_path)
    assert ema_at_40.step == 40
    # The resumed EMA must continue from the saved EMA, not restart from the
    # raw weights: after 20 more steps at decay 0.99, the restored-EMA run
    # differs from what a reset EMA (= raw at step 20) would produce.
    raw_at_20 = ckpt_lib.load(os.path.join(cfg.train.out_dir, "checkpoint.npz"))
    assert raw_at_20.step == 40  # overwritten by the resumed run's saves
    # continuity check: result params == saved final EMA
    for a, b in zip(jax.tree.leaves(r2.params), jax.tree.leaves(ema_at_40.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # and the step-20 EMA differs from the step-40 EMA (it kept evolving)
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(ema_at_20.params), jax.tree.leaves(ema_at_40.params))
    ]
    assert max(diffs) > 0.0


def test_fit_is_seed_deterministic(synth_dir, tmp_path):
    """Same config + seed => bit-identical trained params (full determinism:
    host-side batch sampling and device compute are both seeded)."""
    r1 = fit(_quick_cfg("2", synth_dir, tmp_path / "a", steps=15))
    r2 = fit(_quick_cfg("2", synth_dir, tmp_path / "b", steps=15))
    for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(r2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("loss_mode", ["variety", "hybrid"])
def test_fit_variety_loss_descends(loss_mode, synth_dir, tmp_path):
    """--loss variety/hybrid trains end-to-end and descends (the WTA term
    trains the best-of-K contract metric directly, VERDICT r2 #2)."""
    import dataclasses

    # n_max 12: the N axis only scales the compile (the WTA objective embeds
    # variety_n rollouts in the train program); descent needs the 60 steps.
    cfg = _quick_cfg("3", synth_dir, tmp_path, steps=60, n_max=12)
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, loss=loss_mode, variety_n=4),
    )
    result = fit(cfg)
    first, last = result.history[0][1], result.history[-1][1]
    assert np.isfinite(last)
    assert last < first, f"{loss_mode} loss did not descend: {first} -> {last}"


def test_variety_step_deterministic_and_distinct(synth_dir):
    """The WTA step is RNG-threaded: same step_idx -> identical loss; the
    objective actually differs from nll on the same batch."""
    import jax.numpy as jnp

    from mmtraj.config import ModelConfig, get_config
    from mmtraj.data.transforms import NormStats
    from mmtraj.models.forecaster import Forecaster
    from mmtraj.train import make_optimizer, make_train_step

    # Tiny T: the properties (RNG determinism, objective distinctness, the
    # fde_weight formula reaching the jitted objective) are shape-free, and
    # this test compiles five distinct train-step programs.
    rng = np.random.default_rng(0)
    model = Forecaster(ModelConfig(num_heads=1), 4, 3)
    params = model.init(jax.random.PRNGKey(0))
    stats = NormStats(np.zeros(2, np.float32), np.ones(2, np.float32))
    xy = jnp.asarray(rng.normal(size=(4, 4, 7, 2)).astype(np.float32))
    mask = jnp.asarray(np.ones((4, 4), bool))
    opt = make_optimizer(get_config("3"))

    losses = []
    for _ in range(2):
        p = model.init(jax.random.PRNGKey(0))  # fresh: the step donates it
        step = make_train_step(model, opt, stats, loss_mode="variety",
                               variety_n=3, seed=7)
        _, _, loss = step(p, opt.init(p), xy, mask, jnp.int32(5))
        losses.append(float(loss))
    assert losses[0] == losses[1]

    p = model.init(jax.random.PRNGKey(0))
    step_nll = make_train_step(model, opt, stats, seed=7)
    _, _, l_nll = step_nll(p, opt.init(p), xy, mask)
    assert losses[0] != float(l_nll)

    with pytest.raises(ValueError, match="loss mode"):
        make_train_step(model, opt, stats, loss_mode="wta")

    # The fde_weight knob must reach the jitted objective: lambda=0 is
    # bit-identical to the plain step above; lambda>0 changes the loss.
    p = model.init(jax.random.PRNGKey(0))
    step0 = make_train_step(model, opt, stats, loss_mode="variety",
                            variety_n=3, seed=7, variety_fde_weight=0.0)
    _, _, l0 = step0(p, opt.init(p), xy, mask, jnp.int32(5))
    assert float(l0) == losses[0]
    p = model.init(jax.random.PRNGKey(0))
    step_f = make_train_step(model, opt, stats, loss_mode="variety",
                             variety_n=3, seed=7, variety_fde_weight=0.5)
    _, _, lf = step_f(p, opt.init(p), xy, mask, jnp.int32(5))
    assert float(lf) > losses[0]  # adds a nonnegative, a.s. positive term


@pytest.mark.parametrize("stream", [False, True])
def test_resume_replays_uninterrupted_trajectory(stream, synth_dir, tmp_path):
    """Interrupt mid-epoch, resume, and land on BIT-IDENTICAL params to the
    uninterrupted run: the shuffle stream is a pure function of (seed,
    epoch) and resume skips exactly the consumed batches (VERDICT r2 #8)."""
    import dataclasses

    def run(out, steps, resume=False):
        cfg = _quick_cfg("2", synth_dir, tmp_path, steps=steps, n_max=16)
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, batch_size=8, ckpt_every=7, eval_every=0,
            out_dir=out, stream=stream,
        ))
        return fit(cfg, resume=resume)

    cont = run(str(tmp_path / f"cont{stream}"), steps=14)

    out_i = str(tmp_path / f"intr{stream}")
    run(out_i, steps=7)  # interrupt mid-epoch (batches_per_epoch != 7)
    res = run(out_i, steps=14, resume=True)

    la, lb = jax.tree.leaves(cont.params), jax.tree.leaves(res.params)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_step_dispatch_matches_per_step(synth_dir, tmp_path):
    """steps_per_dispatch compiles M steps into one program (scan +
    in-program gather) but must run the SAME math: identical (seed, epoch)
    permutation stream, identical fold_in(base_key, step) RNG, identical
    optimizer/EMA updates.  Not bit-identical to the per-step path (XLA
    fuses across step boundaries, reassociating float reductions), so this
    pins allclose — covering augment+dropout+EMA+variety, the full RNG
    surface, with 23 = 3*7+2 steps forcing a ragged per-step tail."""
    import dataclasses

    def run(spd, out):
        cfg = _quick_cfg("3", synth_dir, tmp_path, steps=23,
                         obs_len=4, pred_len=3, n_max=12)
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, dropout=0.1),
            train=dataclasses.replace(
                cfg.train, batch_size=8, loss="variety", variety_n=2,
                augment_rotate=True, augment_flip=True, ema_decay=0.99,
                log_every=5, steps_per_dispatch=spd, out_dir=out,
            ),
        )
        return fit(cfg)

    r1 = run(1, str(tmp_path / "spd1"))
    r7 = run(7, str(tmp_path / "spd7"))
    assert [s for s, _ in r1.history] == [s for s, _ in r7.history]
    for (s, a), (_, b) in zip(r1.history, r7.history):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5,
                                   err_msg=f"loss diverged at step {s}")
    for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(r7.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_multi_step_dispatch_boundaries_and_resume(synth_dir, tmp_path):
    """Checkpoint boundaries force ragged per-step tails inside the chunked
    loop (spd=4 vs ckpt_every=10 -> chunks 4,4,2 per period), the periodic
    checkpoint lands at exactly step 10, and a kill+resume replays the
    uninterrupted multi-step trajectory."""
    import dataclasses

    def run(out, steps, resume=False):
        cfg = _quick_cfg("2", synth_dir, tmp_path, steps=steps,
                         obs_len=4, pred_len=3, n_max=16)
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, batch_size=8, ckpt_every=10, eval_every=0,
            steps_per_dispatch=4, out_dir=out,
        ))
        return fit(cfg, resume=resume)

    cont = run(str(tmp_path / "mcont"), steps=20)

    out_i = str(tmp_path / "mintr")
    run(out_i, steps=10)
    ck = ckpt_lib.load(os.path.join(out_i, "checkpoint.npz"))
    assert ck.step == 10
    res = run(out_i, steps=20, resume=True)

    for a, b in zip(jax.tree.leaves(cont.params), jax.tree.leaves(res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_multi_step_dispatch_rejects_stream(synth_dir, tmp_path):
    """The multi-step program gathers batches from the HBM-resident window
    set; combining it with streaming ingest is a config error, not a silent
    fallback."""
    import dataclasses

    cfg = _quick_cfg("1", synth_dir, tmp_path, steps=4)
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, stream=True, steps_per_dispatch=4))
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        fit(cfg)


def test_final_eval_reflects_final_params(synth_dir, tmp_path):
    """steps not a multiple of eval_every: the reported final metrics must be
    an eval of the FINAL parameters, not the last mid-run periodic eval."""
    import dataclasses

    cfg = _quick_cfg("1", synth_dir, tmp_path, steps=30)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, eval_every=20))
    result = fit(cfg)
    model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
    from mmtraj.data.registry import load_split

    _, test_w = load_split(
        cfg.data.data_dir, cfg.data.scene, cfg.data.obs_len, cfg.data.pred_len,
        cfg.data.stride, cfg.data.min_agents,
    )
    test_ds = WindowDataset(test_w, cfg.data.n_max)
    want = evaluate(model, result.params, result.stats, test_ds,
                    cfg.train.k_samples, batch_size=16, seed=cfg.train.seed)
    assert result.eval_metrics["min_ade"] == want["min_ade"]
    assert result.eval_metrics["min_fde"] == want["min_fde"]

"""Population training: vmap the whole train step over seeds.

The repo's quality protocol is multi-seed (RESULTS.md reports mean±std over
5 seeds; `cli eval-loo --ensemble` pools per-seed checkpoints), so the unit
of training work is a SEED SWEEP, not a run.  Sequentially that costs
S × the per-run wall time — and at the config-3 quality-recipe fold shape
(B=64, N≤32) a v5e is dispatch-latency-bound, not FLOP-bound (RESULTS.md
"Multi-step dispatch"), so S sequential runs leave the MXU mostly idle S
times over.

`fit_population(cfg, seeds)` instead stacks the S runs into ONE jitted
program: params/optimizer/EMA states get a leading seed axis, `jax.vmap`
maps the identical one-step core (`train._build_grad_core`) over that axis,
and `lax.scan` folds `steps_per_dispatch` such population steps per host
dispatch.  Each lane reproduces its sequential run exactly:

- per-seed init:      lane s starts from ``model.init(PRNGKey(seed_s))``;
- per-seed RNG:       the core's base key is a traced argument, mapped over
  ``PRNGKey(seed_s ^ 0x5EED)`` — augment/dropout/WTA draws per seed match
  the sequential streams bit-for-bit;
- per-seed data:      each lane gathers ITS OWN batches in-program from the
  shared HBM-resident window set, driven by the sequential trainer's exact
  (seed, epoch) host permutation streams (an (M, S, B) index tensor per
  dispatch);
- shared schedule:    optimizer/LR/EMA math is seed-independent and runs
  per lane on the lane's own state.

Equivalence to S sequential `fit` runs is pinned by
tests/test_population.py (final params allclose at f32, for nll AND variety
objectives, with augment+dropout+EMA on).  Allclose, not bit-equal: on TPU
the vmapped program may tile a batched op differently from its per-run
form, and ulp-level differences are then amplified by training dynamics
(measured on v5e: one zara2 seed bit-exact over 40 steps, another — whose
step-1 NLL is ~3e4, i.e. huge early gradients — drifts to rel 2e-5 by step
5 and ~2e-3 by step 20, converging to statistically equivalent but not
identical eval metrics).  Batches, RNG draws, and optimizer math are the
sequential streams bit-for-bit; the residual is XLA scheduling, the same
class of noise as a DP-mesh re-layout.  Checkpoints land in the same
``{out_dir}/s{seed}/`` tree layout the sequential multi-seed driver writes,
so `eval-loo` (incl. --ensemble) consumes them unchanged.

Scope (v1, documented):
- resident ingest only (the population program gathers in-program, exactly
  like steps_per_dispatch > 1; `stream=True` raises);
- `data_parallel` composes (vmap inside pjit): the per-seed batch axis is
  sharded over the mesh, states and the resident window set replicated, and
  XLA partitions the in-program gather + derives the per-seed grad
  all-reduce from the shardings.  Correctness is pinned on the virtual
  8-device mesh (tests/test_population.py::test_population_data_parallel
  matches the single-device population program).  Whether it *helps* is a
  shape question: at sweep shapes (B=32-64 per seed) an eighth of a batch
  is 4-8 windows per chip — far below the B=25 MXU knee measured in
  ARCHITECTURE.md pt 8 — so DP pays off only when S×B outgrows one chip's
  HBM or step latency, not at the recorded recipes (single-chip hardware
  here; the composition is validated, not endorsed, at these shapes);
- periodic eval is skipped (final per-seed eval always runs; evaluating S
  members every ``eval_every`` would serialize S eval programs into the
  training stream — use `eval-loo` on the written tree instead); periodic
  checkpointing works (per-seed slices, same files fit writes).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mmtraj import checkpoint as ckpt_lib
from mmtraj.config import Config
from mmtraj.data.collate import WindowDataset
from mmtraj.data.pipeline import DeviceDataset
from mmtraj.data.registry import load_split
from mmtraj.data.transforms import compute_norm_stats
from mmtraj.evaluate import evaluate
from mmtraj.models.forecaster import Forecaster
from mmtraj.train import TrainResult, _build_grad_core, make_optimizer
from mmtraj.utils.logging import MetricsLogger


def make_population_step(
    model: Forecaster,
    optimizer,
    stats,
    ema_decay: float = 0.0,
    augment_rotate: bool = False,
    augment_flip: bool = False,
    loss_mode: str = "nll",
    variety_n: int = 8,
    variety_weight: float = 1.0,
    variety_fde_weight: float = 0.0,
    mesh=None,
):
    """Build the jitted population program.

    (params, opt_state, ema, xy_all, mask_all, idx_chunk, step_ids,
    base_keys) -> (params, opt_state, ema, losses) where every state leaf
    carries a leading seed axis S, ``idx_chunk`` is (M, S, B) per-seed batch
    indices into the shared resident window set, ``step_ids`` is (M,), and
    ``base_keys`` is the (S,)-stacked per-seed RNG base keys.  ``losses``
    is (M, S).  One M-step dispatch advances all S runs.

    With ``mesh``, the program composes population (vmap over S) with data
    parallelism (pjit over the mesh): the per-seed batch axis of
    ``idx_chunk`` is sharded over 'data', states and the resident window
    set are replicated, and XLA partitions the in-program gather + derives
    the per-seed gradient all-reduce from the shardings — vmap-inside-pjit.
    Parity with the single-device population program is pinned on the
    virtual 8-device mesh by tests/test_population.py.
    """
    core, needs_rng = _build_grad_core(
        model, optimizer, stats, augment_rotate, augment_flip,
        loss_mode, variety_n, variety_weight, variety_fde_weight,
    )
    use_ema = ema_decay > 0.0
    d = float(ema_decay)

    def pop(params, opt_state, ema, xy_all, mask_all, idx_chunk, step_ids,
            base_keys):
        def body(carry, x):
            params, opt_state, ema = carry
            idx, sid = x  # (S, B), scalar

            def one_seed(p, o, e, ix, bk):
                xy, mask = xy_all[ix], mask_all[ix]
                p, o, loss = core(p, o, xy, mask, sid, bk)
                if use_ema:
                    e = jax.tree.map(lambda a, b: d * a + (1.0 - d) * b, e, p)
                return p, o, e, loss

            params, opt_state, ema, loss = jax.vmap(one_seed)(
                params, opt_state, ema, idx, base_keys
            )
            return (params, opt_state, ema), loss

        (params, opt_state, ema), losses = jax.lax.scan(
            body, (params, opt_state, ema), (idx_chunk, step_ids)
        )
        return params, opt_state, ema, losses

    if mesh is None:
        return jax.jit(pop, donate_argnums=(0, 1, 2)), needs_rng

    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmtraj.parallel.mesh import DATA_AXIS, replicated

    rep = replicated(mesh)
    # idx_chunk is (M, S, B): shard the per-seed batch axis over 'data'.
    # Everything else (states with their leading S axis, the resident window
    # set the gather reads from, step ids, per-seed keys) is replicated; XLA
    # partitions the gather and the per-seed grad mean from these shardings.
    idx_shd = NamedSharding(mesh, P(None, None, DATA_AXIS))
    return jax.jit(
        pop,
        in_shardings=(rep, rep, rep, rep, rep, idx_shd, rep, rep),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1, 2),
    ), needs_rng


def fit_population(
    cfg: Config,
    seeds: Sequence[int],
    data_dir: Optional[str] = None,
    out_dirs: Optional[Sequence[str]] = None,
    logger: Optional[MetricsLogger] = None,
) -> list:
    """Train ``len(seeds)`` seed-variant runs of ``cfg`` as one vmapped
    program; returns a list of `TrainResult`, one per seed, in order.

    ``out_dirs`` overrides the per-seed checkpoint directories (default
    ``{cfg.train.out_dir}/s{seed}`` — the `train --seeds` tree layout that
    `eval-loo` consumes).  Each seed's checkpoint records a config whose
    ``train.seed``/``train.out_dir`` are that seed's, so the written tree is
    indistinguishable from S sequential runs (equivalence pinned by tests).
    """
    seeds = list(seeds)
    if len(seeds) != len(set(seeds)):
        raise ValueError(f"duplicate seeds in population: {seeds}")
    if cfg.train.stream:
        raise ValueError(
            "population training requires resident ingest (stream=False): "
            "each seed lane gathers its batches in-program from the "
            "HBM-resident window set"
        )
    mesh = None
    if cfg.train.data_parallel:
        from mmtraj.parallel.mesh import make_mesh

        mesh = make_mesh()
        if cfg.train.batch_size % mesh.size:
            raise ValueError(
                f"population data_parallel needs batch_size divisible by "
                f"the mesh ({cfg.train.batch_size} % {mesh.size} != 0)")
    if out_dirs is None:
        base = cfg.train.out_dir
        out_dirs = [os.path.join(base, f"s{s}") if base else None
                    for s in seeds]
    if len(out_dirs) != len(seeds):
        raise ValueError("out_dirs must align with seeds")

    data_dir = data_dir or cfg.data.data_dir
    t_setup = time.time()
    train_w, test_w = load_split(
        data_dir, cfg.data.scene, cfg.data.obs_len, cfg.data.pred_len,
        cfg.data.stride, cfg.data.min_agents,
    )
    if not train_w:
        raise RuntimeError(f"no training windows found under {data_dir!r}")
    stats = compute_norm_stats(train_w, cfg.data.obs_len)
    train_ds = WindowDataset(train_w, cfg.data.n_max)
    test_ds = WindowDataset(test_w, cfg.data.n_max) if test_w else None
    if mesh is not None:
        from mmtraj.parallel.mesh import replicated

        device_ds = DeviceDataset(train_ds, sharding=replicated(mesh))
    else:
        device_ds = DeviceDataset(train_ds)

    model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
    S = len(seeds)
    init_keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
    params = jax.vmap(model.init)(init_keys)
    optimizer = make_optimizer(cfg)
    opt_state = jax.vmap(optimizer.init)(params)
    ema_decay = cfg.train.ema_decay
    ema = jax.tree.map(jnp.copy, params) if ema_decay > 0 else None
    base_keys = jnp.stack([jax.random.PRNGKey(s ^ 0x5EED) for s in seeds])

    step_fn, _ = make_population_step(
        model, optimizer, stats, ema_decay,
        augment_rotate=cfg.train.augment_rotate,
        augment_flip=cfg.train.augment_flip,
        loss_mode=cfg.train.loss,
        variety_n=cfg.train.variety_n,
        variety_weight=cfg.train.variety_weight,
        variety_fde_weight=cfg.train.variety_fde_weight,
        mesh=mesh,
    )

    logger = logger or MetricsLogger(cfg.train.out_dir)
    logger.log(
        0, event="setup", population=S, seeds=seeds,
        train_windows=len(train_ds),
        test_windows=len(test_ds) if test_ds else 0,
        dropped_agents=train_ds.n_dropped,
        params=sum(p.size for p in jax.tree.leaves(params)),
        setup_s=round(time.time() - t_setup, 2),
    )

    # Per-seed index streams: exactly the sequential trainer's (seed, epoch)
    # permutation streams, zipped across seeds into (S, B) rows.  Streams
    # advance in lockstep — every seed consumes the same number of batches
    # per dispatch, so epoch boundaries stay aligned across the population.
    def seed_index_stream(seed: int):
        e = 0
        while True:
            rng = np.random.default_rng([seed, e])
            yield from device_ds.epoch_indices(cfg.train.batch_size, rng)
            e += 1

    streams = [seed_index_stream(s) for s in seeds]

    xy_all, mask_all = device_ds.xy, device_ds.mask
    spd = max(1, cfg.train.steps_per_dispatch)
    ckpt_every = cfg.train.ckpt_every
    history: list = [[] for _ in seeds]
    step = 0
    t_train = time.time()

    def save_all(at_step: int, final: bool = False):
        for i, (seed, out) in enumerate(zip(seeds, out_dirs)):
            if not out:
                continue
            cfg_s = cfg.replace(train=dataclasses.replace(
                cfg.train, seed=seed, out_dir=out))
            p_i = jax.tree.map(lambda a: a[i], params)
            # Slice this seed's optimizer state too (every leaf carries the
            # leading S axis from the vmapped init), so `train --resume` on a
            # population-written tree continues the optimizer rather than
            # silently reinitializing it — same file shape as sequential fit.
            o_i = jax.tree.map(lambda a: a[i], opt_state)
            ckpt_lib.save(os.path.join(out, "checkpoint.npz"),
                          p_i, stats, cfg_s, at_step, o_i)
            if ema_decay > 0:
                e_i = jax.tree.map(lambda a: a[i], ema)
                ckpt_lib.save(os.path.join(out, "checkpoint_ema.npz"),
                              e_i, stats, cfg_s, at_step)
        logger.log(at_step, event="checkpoint", population=S,
                   **({"final": True} if final else {}))

    def next_boundary(s: int) -> int:
        b = cfg.train.steps
        if ckpt_every > 0:
            b = min(b, (s // ckpt_every + 1) * ckpt_every)
        return b

    while step < cfg.train.steps:
        m = min(spd, next_boundary(step) - step)
        idx_chunk = jnp.asarray(np.stack(
            [np.stack([next(st) for st in streams]) for _ in range(m)]
        ))  # (m, S, B)
        step_ids = jnp.arange(step, step + m, dtype=jnp.int32)
        params, opt_state, ema, losses = step_fn(
            params, opt_state, ema, xy_all, mask_all, idx_chunk, step_ids,
            base_keys,
        )
        to_log = [
            t for t in range(step + 1, step + m + 1)
            if t % cfg.train.log_every == 0 or t == 1
        ]
        if to_log:
            lv = np.asarray(losses)  # (m, S)
            for t in to_log:
                row = lv[t - step - 1]
                for i in range(S):
                    history[i].append((t, float(row[i])))
                sps = t / max(time.time() - t_train, 1e-9)
                logger.log(t, loss=float(row.mean()),
                           loss_per_seed=[round(float(x), 4) for x in row],
                           steps_per_sec=round(sps, 2))
        step += m
        if ckpt_every > 0 and step % ckpt_every == 0 and step < cfg.train.steps:
            save_all(step)

    save_all(step, final=True)

    results = []
    for i, (seed, out) in enumerate(zip(seeds, out_dirs)):
        cfg_s = cfg.replace(train=dataclasses.replace(
            cfg.train, seed=seed, out_dir=out or cfg.train.out_dir))
        p_i = jax.tree.map(lambda a: a[i], ema if ema_decay > 0 else params)
        eval_metrics = {}
        if test_ds is not None:
            eval_metrics = evaluate(
                model, p_i, stats, test_ds, cfg.train.k_samples,
                batch_size=min(cfg.train.batch_size, 64), seed=seed,
            )
            logger.log(step, seed=seed,
                       **{f"eval_{k}": v for k, v in eval_metrics.items()})
        results.append(TrainResult(p_i, stats, cfg_s, history[i], eval_metrics))
    return results

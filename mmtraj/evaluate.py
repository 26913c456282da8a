"""Best-of-K evaluation over a held-out scene (BASELINE.json:2,9).

Batches the test windows at a fixed shape (last batch padded with all-invalid
windows), accumulates masked error *sums* and agent counts, and divides once —
so padding never biases the reported ADE/FDE.  The K=20 sampling runs fully
on device: encode once per batch, `vmap` over sample keys (SURVEY.md §3.2 is
the reference's Python-loop version of this stack; this is the collapsed XLA
program).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mmtraj.data.collate import WindowDataset
from mmtraj.data.transforms import NormStats
from mmtraj.metrics import collisions, displacement_errors
from mmtraj.models.gmm import nll as gmm_nll
from mmtraj.models.forecaster import Forecaster


def vmem_friendly_batch(k: int, n_max: int, cap: int = 64,
                        bytes_per_elem: int = 2,
                        vmem_budget: int = 4 * 2**20) -> int:
    """Largest eval batch whose per-head attention tensor stays VMEM-resident.

    The K-sample rollout's hot op is the per-head masked attention over
    ``B*K`` graphs; its alpha tensor ([B*K, n_max, n_max]) is staged
    HBM<->VMEM each decode step once it outgrows XLA's scoped-VMEM window
    (~4 MiB usable at these shapes — the HLO-level analysis is
    ARCHITECTURE.md pt 8).  Keeping ``B*K*n_max^2*bytes`` under that bound
    measured +58% rollout throughput on v5e (167k vs 106k window-rollouts/s
    at n_max=64, K=20, bf16 -> B=25; cliff confirmed at B=26).  Throughput is
    per window, so preferring more, narrower batches is free end-to-end.

    ``bytes_per_elem`` is the attention compute dtype's width (2 for the bf16
    flagship, 4 for float32 models — evaluate() derives it from the model
    config).  ``vmem_budget`` is the measured v5e scoped-VMEM window; it is a
    *generation-specific constant* (v4/v6e have different VMEM arbitration) —
    override it rather than trusting the default on other hardware.

    Scope note: the cliff this sizes against is the XLA attention chain's
    alpha staging.  At N >= 128 on TPU the auto-dispatched Pallas attend
    kernel (ModelConfig.attend_kernel) manages VMEM per program instead;
    its measured end-to-end optimum at N=128/K=20 is B~=12 (vs 6 from this
    formula, within ~10%) — pin ``batch_size`` explicitly when squeezing
    that regime."""
    rows = vmem_budget // (max(n_max, 1) ** 2 * bytes_per_elem)
    return max(1, min(cap, rows // max(k, 1)))


def _model_bytes_per_elem(model: "Forecaster") -> int:
    """Attention-alpha byte width for vmem_friendly_batch, from the model's
    compute dtype (ADVICE r2: an f32 model's working set is 2x the bf16
    calibration; sizing it as bf16 would overshoot the VMEM cliff)."""
    return 2 if model.cfg.dtype == "bfloat16" else 4


def autotune_eval_batch(model: Forecaster, params, stats: NormStats,
                        n_max: int, k: int = 20, iters: int = 20,
                        candidates=None, verbose: bool = True) -> int:
    """Measure the best eval batch size ON THIS CHIP and return it.

    `vmem_friendly_batch` encodes v5e-measured physics (the ~4 MiB
    scoped-VMEM alpha cliff); on other TPU generations the cliff moves and
    the analytic constant is silently wrong (VERDICT r2 weak #5).  This
    times the actual K-sample rollout at a handful of candidate batches
    bracketing the analytic guess and returns the fastest per-window.
    Compile cost: each candidate is a distinct program; the full-unroll
    variants compile in MINUTES cold on the tunnel (BENCH_r03 measured
    808 s for one flagship program) but land in the persistent compile
    cache (utils/compile_cache.py, on by default in the CLI), so rerunning
    the autotuner — or evaluating at the winning batch afterwards — pays
    seconds, not minutes.  Use via `cli autotune-eval`, then pass the
    winner as ``batch_size=`` / ``--batch-size``."""
    import time

    if model.cfg.scan_unroll == 1:
        # Mirror _eval_sums: the eval program fully unrolls the time loops,
        # so the autotuner must time that same schedule.
        import dataclasses

        model = Forecaster(
            dataclasses.replace(model.cfg, scan_unroll=model.pred_len),
            model.obs_len, model.pred_len,
        )
    guess = vmem_friendly_batch(k, n_max,
                                bytes_per_elem=_model_bytes_per_elem(model))
    if candidates is None:
        cand = {1, max(1, guess // 2), max(1, guess - 1), guess,
                guess + 1, guess + 3, min(64, 2 * guess), 64}
        candidates = sorted(cand)
    rng = np.random.default_rng(0)
    best_b, best_wps = None, -1.0
    for b in candidates:
        steps = rng.normal(size=(b, n_max, model.obs_len, 2)).astype(np.float32)
        xy_obs = jnp.asarray(np.cumsum(steps, axis=2) * 0.4)
        mask = jnp.asarray(rng.random((b, n_max)) < 0.75)

        @jax.jit
        def many(p, x, m, key):
            keys = jax.random.split(key, iters)

            def body(c, kk):
                xk = x + jax.random.uniform(kk, (), jnp.float32, 0.0, 1e-6)
                return c + model.rollout_k(p, xk, m, stats, kk, k).mean(), None

            return jax.lax.scan(body, 0.0, keys)[0]

        try:
            float(many(params, xy_obs, mask, jax.random.PRNGKey(0)))  # compile
            t0 = time.time()
            float(many(params, xy_obs, mask, jax.random.PRNGKey(1)))
            wps = b * iters / (time.time() - t0)
        except Exception as e:  # e.g. OOM at a large candidate
            if verbose:
                print(f"  B={b:3d}: failed ({type(e).__name__})", flush=True)
            continue
        if verbose:
            tag = " <- analytic guess" if b == guess else ""
            print(f"  B={b:3d}: {wps:10,.0f} window-rollouts/s{tag}", flush=True)
        if wps > best_wps:
            best_b, best_wps = b, wps
    if best_b is None:
        raise RuntimeError(
            f"autotune_eval_batch: no candidate batch succeeded "
            f"({list(candidates)}) — likely OOM at every size; try smaller "
            f"candidates or a smaller n_max"
        )
    if verbose:
        print(f"best eval batch on this chip: {best_b} "
              f"({best_wps:,.0f} window-rollouts/s)", flush=True)
    return int(best_b)


def _tta_mats(tta: int):
    """The ``tta`` orthogonal view matrices: ceil(tta/2) rotations evenly
    spaced over [0, 2pi), then the same rotations composed with a
    y-reflection.  View 0 is the exact identity (the plain protocol)."""
    import math

    n_rot = (tta + 1) // 2
    mats = []
    for t in range(tta):
        a = 2.0 * math.pi * (t % n_rot) / n_rot
        c, s = math.cos(a), math.sin(a)
        mats.append(((c, -s), (s, c)) if t < n_rot
                    else ((c, -s), (-s, -c)))  # y-flip after the rotation
    return mats


@functools.lru_cache(maxsize=32)
def _eval_sums(model: Forecaster, k: int, mesh=None, reduction: str = "per_agent",
               sigma_scale: float = 1.0, rollout: str = "sample",
               oversample: int = 1, ensemble: int = 1, tta: int = 1,
               draw_n: int = None):
    """Jittable per-batch evaluator -> PER-WINDOW masked error sums + counts.

    Cached per (model, k, mesh, reduction): periodic eval during training must
    reuse the compiled program, not re-jit each call (Forecaster is hashable:
    it wraps a frozen config + ints).  With a mesh the batch is sharded over
    'data' (each chip rolls out its slice of windows for all K samples) — the
    same SPMD shape as training (BASELINE.json:11).

    Execution-shape invariance (VERDICT r2 weak #1): every reported number is
    a pure function of the (seed, window) pair, never of batching.  Two
    mechanisms:

    * per-window RNG — window w samples from fold_in(seed_key, w), so its K
      rollouts are identical at any batch size/position/mesh padding;
    * per-window sums — the program returns (B,) vectors, one entry per
      window, and evaluate() reduces them on the host with exact (fsum)
      addition, so aggregation is independent of how windows were batched.

    ``reduction`` selects the best-of-K protocol variant (the reference's
    exact choice is unverifiable — PARITY.md "Known deltas"; both are shipped
    so parity day is a flag flip):

    * ``per_agent``  — min over K independently per agent, mean over agents
      (the common "best-of-20" protocol);
    * ``per_window`` — one joint k chosen per window (min over K of the
      window's masked-mean error), mean over windows.

    ``ensemble`` > 1 pools candidates from M independently trained models
    (deep ensemble): ``params`` then carries a leading stacked member axis,
    member m samples from fold_in(fold_in(seed_key, m), w) — still a pure
    function of (seed, member, window) — and the submitted set stays K via
    the same endpoint-diverse selection oversampling uses, so the protocol
    remains best-of-K.  The reported NLL is the deep-ensemble predictive
    NLL (per-step mixture over members: -logsumexp(-nll_m) + log M).

    ``tta`` > 1 pools candidates from orthogonal test-time-augmentation
    views (`_tta_mats`): view t rolls out on R_t-transformed world coords
    and maps samples back through R_t^-1.  Distances — hence the social
    graph — are exactly invariant, and training augments with arbitrary
    rotations/flips of the raw coords (data/transforms.py augment_windows),
    so each view is an in-distribution, slightly-different predictor: a
    weight-shared pseudo-ensemble whose value comes from the model's
    *imperfect* equivariance.  Composes with ensemble and oversample; the
    pool again reduces to K submitted samples via diverse selection.

    Invariance caveat (TPU): batch-size invariance is bit-exact on CPU (one
    compiled program), but on TPU different batch sizes compile different
    physical tilings whose ~1-ulp rollout differences can flip a discrete
    diverse-selection pick under the member-vmapped program — measured
    ≤3e-4 FDE drift at tiny shapes, far below the ±1.4e-3 seed spread.
    Pin ``batch_size`` when bit-stability across runs matters.
    """

    # Inference-only program: fully unroll the 8/12-step time loops.  The
    # rollout is latency-bound, and removing the XLA while-loops measured
    # +7.5% (168k -> 180k window-rollouts/s on v5e at the flagship shape);
    # training keeps scan (unroll measured -5% there with remat replays).
    # Bit-exact either way (tests/test_models.py::test_scan_unroll_trajectory_exact).
    if model.cfg.scan_unroll == 1:
        import dataclasses

        model = Forecaster(
            dataclasses.replace(model.cfg, scan_unroll=model.pred_len),
            model.obs_len, model.pred_len,
        )

    def fn(params, xy, mask, win_idx, stats_mean, stats_std, key):
        stats = NormStats(stats_mean, stats_std)
        obs = xy[:, :, : model.obs_len]
        gt = xy[:, :, model.obs_len :]
        def candidates(p, base_key):
            """All of one member's tta*oversample*k sampled candidates
            (view 0 first, so [:k] stays the plain identity joint set),
            plus the identity encoder carry for the NLL."""
            carry0 = model.encode(p, obs, mask, stats)
            outs = []
            for t in range(tta):
                if t == 0:
                    key_t, obs_t, carry_t = base_key, obs, carry0
                else:
                    R = jnp.asarray(_tta_mats(tta)[t], jnp.float32)
                    key_t = jax.random.fold_in(base_key, t)
                    obs_t = jnp.einsum("ij,bntj->bnti", R, obs)
                    carry_t = model.encode(p, obs_t, mask, stats)
                keys = jax.vmap(lambda i: jax.random.fold_in(key_t, i))(win_idx)
                pr = model.rollout_k(p, obs_t, mask, stats, None,
                                     k * oversample, carry=carry_t,
                                     sigma_scale=sigma_scale, keys=keys,
                                     draw_n=draw_n)
                if t > 0:
                    # R is orthogonal: the inverse map is its transpose.
                    R = jnp.asarray(_tta_mats(tta)[t], jnp.float32)
                    pr = jnp.einsum("ji,sbntj->sbnti", R, pr)
                outs.append(pr)
            pool = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
            return pool, carry0

        nll_m = None  # set by the ensemble branch (per-member NLL)
        if ensemble > 1:
            # Deep ensemble: params carries a stacked member axis; each
            # member rolls out its own candidates with a member-distinct
            # per-window stream, and the pool reduces to K submitted
            # samples via endpoint-diverse selection below.
            def member(p, m):
                preds, carry = candidates(p, jax.random.fold_in(key, m))
                from mmtraj.data.transforms import normalize, to_relative

                dxy_n = normalize(to_relative(xy), stats)[:, :, model.obs_len:]
                outs = model.decode_teacher(p, carry, gt, dxy_n, mask)
                return preds, gmm_nll(outs, dxy_n)

            preds_m, nll_m = jax.vmap(member)(
                params, jnp.arange(ensemble, dtype=jnp.uint32)
            )  # (M, R, B, N, Tp, 2), (M, B, N, Tp)
            # Collision stays a joint-sample metric: member 0's first K raw
            # identity rollouts keep the pairing (mirrors oversample).
            joint_k = preds_m[0, :k]
            preds = preds_m.reshape((-1,) + preds_m.shape[2:])
        else:
            if rollout == "modes":
                # Deterministic best-of-M over the mixture components (the
                # alternative multimodal protocol — forecaster.rollout_modes).
                carry = model.encode(params, obs, mask, stats)
                preds = model.rollout_modes(params, obs, mask, stats, carry=carry)
            else:
                # Per-window keys: window w's samples are fold_in(seed_key, w)
                # regardless of which batch it landed in.
                preds, carry = candidates(params, key)
            # Collision is defined between agents OF THE SAME JOINT SAMPLE
            # (metrics.py); per-agent diverse selection destroys that pairing,
            # so measure it on the first K raw (still-joint) rollouts.
            joint_k = preds[:k]
        if rollout != "modes" and preds.shape[0] > k:
            if reduction == "per_window":
                # Joint selection: each window keeps K whole joint samples,
                # preserving the joint-sample semantics per_window scores.
                from mmtraj.models.sampling import diverse_select_joint

                preds = diverse_select_joint(preds, mask, k)
            else:
                # Sample-and-select: keep the K most endpoint-diverse of the
                # R candidates per agent (models/sampling.py).
                from mmtraj.models.sampling import diverse_select

                preds = diverse_select(preds, k)
        ade_k, fde_k = displacement_errors(preds, gt[None])  # (K,B,N)
        m = mask.astype(jnp.float32)
        n_per_w = m.sum(axis=1)  # (B,)
        has = (n_per_w > 0).astype(jnp.float32)
        if reduction == "per_window":
            denom = jnp.maximum(n_per_w, 1.0)
            ade_w = (ade_k * m).sum(axis=2) / denom  # (K, B) masked mean
            fde_w = (fde_k * m).sum(axis=2) / denom
            ade_pw = ade_w.min(axis=0) * has  # (B,)
            fde_pw = fde_w.min(axis=0) * has
        else:
            ade_pw = (ade_k.min(axis=0) * m).sum(axis=1)  # (B,)
            fde_pw = (fde_k.min(axis=0) * m).sum(axis=1)
        # MR-K@2m numerator: agents whose BEST final displacement misses 2m.
        miss_pw = ((fde_k.min(axis=0) > 2.0) * m).sum(axis=1)
        # Collision numerator, per-agent-normalized over the K joint samples.
        coll = collisions(joint_k, mask)  # (K, B, N) bool
        coll_pw = (coll * m[None]).sum(axis=(0, 2)) / joint_k.shape[0]
        # Predictive NLL of the ground-truth future under the (teacher-forced)
        # per-step mixture — the probabilistic-quality metric; 0 for
        # deterministic heads.
        if nll_m is not None:
            # Deep-ensemble predictive NLL: the predictive distribution is
            # the uniform mixture over members, so per step
            # nll = -log(mean_m exp(-nll_m)) = -logsumexp(-nll_m) + log M.
            per_step = -jax.nn.logsumexp(-nll_m, axis=0) + jnp.log(
                jnp.float32(ensemble)
            )  # (B, N, Tp)
            nll_pw = (per_step.mean(axis=-1) * m).sum(axis=1)
        elif model.cfg.head == "gmm":
            from mmtraj.data.transforms import normalize, to_relative

            dxy_n = normalize(to_relative(xy), stats)[:, :, model.obs_len:]
            outs = model.decode_teacher(params, carry, gt, dxy_n, mask)
            per_step = gmm_nll(outs, dxy_n)  # (B, N, Tp)
            nll_pw = (per_step.mean(axis=-1) * m).sum(axis=1)
        else:
            nll_pw = jnp.zeros_like(n_per_w)
        return ade_pw, fde_pw, miss_pw, coll_pw, nll_pw, n_per_w, has

    if mesh is None:
        return jax.jit(fn)
    from mmtraj.parallel.mesh import batch_sharding, replicated

    rep, shd = replicated(mesh), batch_sharding(mesh)
    return jax.jit(
        fn,
        in_shardings=(rep, shd, shd, shd, rep, rep, rep),
        out_shardings=(shd,) * 7,
    )


@functools.lru_cache(maxsize=32)
def _member_pool(model: Forecaster, k: int, sigma_scale: float,
                 oversample: int, tta: int):
    """Jittable per-batch candidate-pool program for ONE ensemble member.

    Returns (preds, nll): the member's tta*oversample*k sampled candidates
    (view 0 first — [:k] is the plain identity joint set) and its per-step
    teacher-forced GMM NLL.  Member m of an ensemble samples from
    fold_in(fold_in(seed_key, m), w) — identical streams to the homogeneous
    stacked-vmap path in _eval_sums, so a mixed ensemble of same-architecture
    members reproduces `evaluate(model, [p0, p1, ...])` exactly (pinned by
    tests/test_evaluate.py).  One program compiles per distinct model; pooling
    M seeds x F families costs F compiles, not M*F.
    """
    if model.cfg.scan_unroll == 1:
        import dataclasses

        model = Forecaster(
            dataclasses.replace(model.cfg, scan_unroll=model.pred_len),
            model.obs_len, model.pred_len,
        )

    def fn(params, xy, mask, win_idx, stats_mean, stats_std, base_key):
        stats = NormStats(stats_mean, stats_std)
        obs = xy[:, :, : model.obs_len]
        gt = xy[:, :, model.obs_len:]
        carry0 = model.encode(params, obs, mask, stats)
        outs = []
        for t in range(tta):
            if t == 0:
                key_t, obs_t, carry_t = base_key, obs, carry0
            else:
                R = jnp.asarray(_tta_mats(tta)[t], jnp.float32)
                key_t = jax.random.fold_in(base_key, t)
                obs_t = jnp.einsum("ij,bntj->bnti", R, obs)
                carry_t = model.encode(params, obs_t, mask, stats)
            keys = jax.vmap(lambda i: jax.random.fold_in(key_t, i))(win_idx)
            pr = model.rollout_k(params, obs_t, mask, stats, None,
                                 k * oversample, carry=carry_t,
                                 sigma_scale=sigma_scale, keys=keys)
            if t > 0:
                R = jnp.asarray(_tta_mats(tta)[t], jnp.float32)
                pr = jnp.einsum("ji,sbntj->sbnti", R, pr)
            outs.append(pr)
        preds = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
        from mmtraj.data.transforms import normalize, to_relative

        dxy_n = normalize(to_relative(xy), stats)[:, :, model.obs_len:]
        teach = model.decode_teacher(params, carry0, gt, dxy_n, mask)
        return preds, gmm_nll(teach, dxy_n)

    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _mixed_reduce(n_members: int, k: int, reduction: str):
    """Jittable reducer over a pooled candidate set -> per-window sums.

    Same masked per-window accumulation contract as _eval_sums (exact
    host-side fsum aggregation downstream), with the deep-ensemble
    predictive NLL over the stacked per-member teacher NLLs."""

    def fn(preds, nll_m, joint_k, xy, mask, obs_len):
        gt = xy[:, :, obs_len:]
        if preds.shape[0] > k:
            if reduction == "per_window":
                from mmtraj.models.sampling import diverse_select_joint

                preds = diverse_select_joint(preds, mask, k)
            else:
                from mmtraj.models.sampling import diverse_select

                preds = diverse_select(preds, k)
        ade_k, fde_k = displacement_errors(preds, gt[None])
        m = mask.astype(jnp.float32)
        n_per_w = m.sum(axis=1)
        has = (n_per_w > 0).astype(jnp.float32)
        if reduction == "per_window":
            denom = jnp.maximum(n_per_w, 1.0)
            ade_pw = ((ade_k * m).sum(axis=2) / denom).min(axis=0) * has
            fde_pw = ((fde_k * m).sum(axis=2) / denom).min(axis=0) * has
        else:
            ade_pw = (ade_k.min(axis=0) * m).sum(axis=1)
            fde_pw = (fde_k.min(axis=0) * m).sum(axis=1)
        miss_pw = ((fde_k.min(axis=0) > 2.0) * m).sum(axis=1)
        coll = collisions(joint_k, mask)
        coll_pw = (coll * m[None]).sum(axis=(0, 2)) / joint_k.shape[0]
        per_step = -jax.nn.logsumexp(-nll_m, axis=0) + jnp.log(
            jnp.float32(n_members))
        nll_pw = (per_step.mean(axis=-1) * m).sum(axis=1)
        return ade_pw, fde_pw, miss_pw, coll_pw, nll_pw, n_per_w, has

    return jax.jit(fn, static_argnames=("obs_len",))


def evaluate_mixed(
    members,
    stats: NormStats,
    test_ds: WindowDataset,
    k: int = 20,
    batch_size: int | None = None,
    seed: int = 0,
    reduction: str = "per_agent",
    sigma_scale: float = 1.0,
    oversample: int = 1,
    tta: int = 1,
) -> Dict[str, float]:
    """Best-of-K evaluation of a HETEROGENEOUS deep ensemble.

    ``members`` is a sequence of ``(model, params)`` pairs whose ModelConfigs
    may differ (e.g. the recurrent and attention encoder families, or
    different depths/seeds) as long as every member has the GMM head and the
    same obs/pred horizon.  All members' tta*oversample*k sampled candidates
    pool per window and endpoint-diverse selection submits K, so the
    protocol stays best-of-K — exactly the `evaluate(model, [params...])`
    deep-ensemble semantics, generalized to members that cannot share one
    stacked parameter tree.  Member RNG streams and the per-window keys match
    the homogeneous path (member m draws from fold_in(seed_key, m), and a
    single member draws from seed_key itself like the plain protocol), so a
    mixed ensemble of same-architecture members reproduces
    `evaluate(model, [p...])` — and a single-member one reproduces
    `evaluate(model, p)` (pinned by tests).  Reported NLL is the ensemble
    predictive NLL (uniform mixture over members).

    Execution-shape invariance: numbers are a pure function of
    (seed, member order, window set) — never of batching.
    """
    members = list(members)
    if len(members) == 0:
        raise ValueError("empty ensemble")
    for model, _ in members:
        if model.cfg.head != "gmm":
            raise ValueError("ensemble evaluation requires sampled GMM rollouts")
        if (model.obs_len, model.pred_len) != (members[0][0].obs_len,
                                               members[0][0].pred_len):
            raise ValueError("ensemble members must share the obs/pred horizon")
    if reduction not in ("per_agent", "per_window"):
        raise ValueError(f"unknown reduction {reduction!r}")
    if oversample < 1:
        raise ValueError(f"oversample must be >= 1, got {oversample}")
    if tta < 1:
        raise ValueError(f"tta must be >= 1, got {tta}")
    if batch_size is None:
        bpe = max(_model_bytes_per_elem(m) for m, _ in members)
        batch_size = vmem_friendly_batch(k * oversample * tta, test_ds.n_max,
                                         bytes_per_elem=bpe)
    n_dropped = int(getattr(test_ds, "n_dropped", 0))
    if n_dropped > 0:
        import warnings

        warnings.warn(
            f"evaluation dataset dropped {n_dropped} agents that exceeded "
            f"n_max={test_ds.n_max}; reported metrics cover a reduced "
            "population — raise n_max (cli: --auto-n-max) for protocol-exact "
            "numbers",
            stacklevel=2,
        )
    reduce_fn = _mixed_reduce(len(members), k, reduction)
    key = jax.random.PRNGKey(seed)
    n = len(test_ds)
    mean = jnp.asarray(stats.mean)
    std = jnp.asarray(stats.std)
    obs_len = members[0][0].obs_len
    sums = []
    for s in range(0, n, batch_size):
        idx = np.arange(s, min(s + batch_size, n))
        xy, mask = test_ds.batch(idx)
        if len(idx) < batch_size:
            pad = batch_size - len(idx)
            xy = np.concatenate([xy, np.zeros((pad,) + xy.shape[1:], xy.dtype)])
            mask = np.concatenate([mask, np.zeros((pad,) + mask.shape[1:], bool)])
        xy, mask = jnp.asarray(xy), jnp.asarray(mask)
        win_idx = jnp.arange(s, s + batch_size, dtype=jnp.int32)
        pools, nlls = [], []
        for i, (model, params) in enumerate(members):
            fn = _member_pool(model, k, float(sigma_scale), int(oversample),
                              int(tta))
            base_key = key if len(members) == 1 else jax.random.fold_in(
                key, jnp.uint32(i))
            preds, nll = fn(params, xy, mask, win_idx, mean, std, base_key)
            pools.append(preds)
            nlls.append(nll)
        # Collision keeps joint-sample pairing: member 0's first K raw
        # identity rollouts (mirrors the homogeneous ensemble path).
        sums.append(reduce_fn(jnp.concatenate(pools, 0), jnp.stack(nlls),
                              pools[0][:k], xy, mask, obs_len=obs_len))
    import math

    per_window = [
        np.concatenate([np.asarray(t, np.float64) for t in parts])
        for parts in zip(*map(jax.device_get, sums))
    ] if sums else [np.zeros(0)] * 7
    ade_sum, fde_sum, miss_sum, coll_sum, nll_sum, n_agents, n_win = (
        math.fsum(a) for a in per_window
    )
    n_agents = max(n_agents, 1.0)
    primary = max(n_win, 1.0) if reduction == "per_window" else n_agents
    return {
        "min_ade": ade_sum / primary,
        "min_fde": fde_sum / primary,
        "miss_rate_2m": miss_sum / n_agents,
        "collision_rate": coll_sum / n_agents,
        "nll": nll_sum / n_agents,
        "k": k,
        "reduction": reduction,
        "n_windows": n,
        "n_agents": int(n_agents),
        "n_dropped": n_dropped,
        "ensemble": len(members),
        **({"sigma_scale": float(sigma_scale)} if sigma_scale != 1.0 else {}),
        **({"oversample": int(oversample)} if oversample > 1 else {}),
        **({"tta": int(tta)} if tta > 1 else {}),
    }


def evaluate(
    model: Forecaster,
    params,
    stats: NormStats,
    test_ds: WindowDataset,
    k: int = 20,
    batch_size: int | None = None,
    seed: int = 0,
    mesh=None,
    reduction: str = "per_agent",
    sigma_scale: float = 1.0,
    rollout: str = "sample",
    oversample: int = 1,
    tta: int = 1,
    buckets=None,
) -> Dict[str, float]:
    """Full-test-set best-of-K ADE/FDE in world meters.

    ``batch_size=None`` (default) picks `vmem_friendly_batch(k, n_max)` — the
    widest batch whose attention working set stays VMEM-resident (measured
    +58% eval throughput at the flagship shape; pass an explicit value to pin
    a protocol).
    ``mesh``: optional jax Mesh; shards each eval batch over its 'data' axis
    (batch_size is rounded up to a multiple of the mesh size).
    ``reduction``: "per_agent" (default) or "per_window" — see _eval_sums.
    ``params`` may be a list/tuple of M same-architecture parameter trees
    (e.g. the per-seed checkpoints of one fold): the models evaluate as a
    deep ensemble — all M*K*oversample candidate rollouts pool per window
    and endpoint-diverse selection submits K, so the protocol stays
    best-of-K (see _eval_sums; requires the sampled GMM rollout).
    ``tta``: number of orthogonal test-time-augmentation views to pool
    candidates from (1 = none; see _eval_sums — same selection-back-to-K
    protocol, requires the sampled GMM rollout).
    ``buckets``: optional agent-capacity buckets, e.g. (16, 32, 64) — each
    window runs in the smallest compiled capacity holding its agents instead
    of the full n_max padding (real ETH/UCY is bimodal: zara windows carry
    ~2-12 agents, univ 30-50+, and a 6-agent window at n_max=64 wastes >90%
    of the attend compute on padding).  Metrics are EXACTLY the padded
    path's (canonical-N RNG + masking invariance; bit-equal on CPU, pinned
    by test — on TPU the per-bucket physical tilings carry the same ~ulp
    caveat as batch-size changes, see the invariance note in _eval_sums).
    The full n_max is always included as the last-resort bucket; one
    program compiles per occupied bucket (compile-cache-amortized).

    If the dataset dropped agents at collation (windows over ``n_max``), the
    metrics dict reports ``n_dropped`` and a warning is emitted: a silently
    reduced metric population would otherwise misreport the protocol on real
    dense scenes (use a larger n_max / --auto-n-max to include everyone)."""
    if reduction not in ("per_agent", "per_window"):
        raise ValueError(f"unknown reduction {reduction!r}")
    if rollout not in ("sample", "modes"):
        raise ValueError(f"unknown rollout {rollout!r}")
    if oversample < 1:
        raise ValueError(f"oversample must be >= 1, got {oversample}")
    if tta < 1:
        raise ValueError(f"tta must be >= 1, got {tta}")
    if tta > 1 and (model.cfg.head != "gmm" or rollout != "sample"):
        # The view pool must reduce back to K submitted samples via diverse
        # selection over distinct sampled candidates.
        raise ValueError("tta requires sampled GMM rollouts")
    ensemble = 1
    if isinstance(params, (list, tuple)):
        if len(params) == 0:
            raise ValueError("empty ensemble")
        if len(params) == 1:
            params = params[0]  # ensemble of one == the plain protocol
        else:
            ensemble = len(params)
            if model.cfg.head != "gmm" or rollout != "sample":
                # The pool must reduce to K submitted samples via diverse
                # selection, which needs distinct sampled candidates.
                raise ValueError(
                    "ensemble evaluation requires sampled GMM rollouts")
            params = jax.tree.map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *params
            )
    if sigma_scale != 1.0 and (rollout == "modes" or model.cfg.head != "gmm"):
        # Tempering scales GMM sampling noise; the mode decode and
        # deterministic heads never sample, so a non-1 value would stamp
        # "tempered" onto numbers it did not affect.
        raise ValueError("sigma_scale applies to sampled GMM rollouts only")
    if rollout == "modes":
        # Deterministic enumeration of the head's components: best-of-M with
        # M = num_mixtures; K and sigma_scale are sampling-only knobs.
        if model.cfg.head != "gmm":
            raise ValueError("rollout='modes' requires the GMM head")
        if oversample > 1:
            raise ValueError("oversample applies to sampled rollouts only")
        k = model.cfg.num_mixtures
    if oversample > 1 and model.cfg.head != "gmm":
        # A deterministic head rolls out k identical trajectories; there is
        # nothing to diversify.
        raise ValueError("oversample requires the sampling (GMM) head")
    explicit_batch = batch_size is not None
    if batch_size is None:
        # The rollout working set scales with the sampled rows — R =
        # ensemble*tta*oversample*K of them when pooling is on.
        batch_size = vmem_friendly_batch(k * oversample * ensemble * tta,
                                         test_ds.n_max,
                                         bytes_per_elem=_model_bytes_per_elem(model))
        if mesh is not None:
            # vmem_friendly_batch is the PER-CHIP optimum and the batch is
            # sharded over 'data': scale by the mesh so every chip runs at
            # its own optimum (metrics are batch-size invariant by design —
            # per-window RNG — so only throughput depends on this).
            batch_size *= mesh.size
    # sigma_scale != 1 tempers the GMM sampling (forecaster.decode_rollout);
    # reported alongside the metrics so tempered numbers can't masquerade as
    # the untempered protocol.
    n_dropped = int(getattr(test_ds, "n_dropped", 0))
    if n_dropped > 0:
        import warnings

        warnings.warn(
            f"evaluation dataset dropped {n_dropped} agents that exceeded "
            f"n_max={test_ds.n_max}; reported metrics cover a reduced "
            "population — raise n_max (cli: --auto-n-max) for protocol-exact "
            "numbers",
            stacklevel=2,
        )
    if mesh is not None:
        batch_size += (-batch_size) % mesh.size
    key = jax.random.PRNGKey(seed)  # constant; per-window keys fold in w
    n = len(test_ds)
    mean = jnp.asarray(stats.mean)
    std = jnp.asarray(stats.std)
    # Accumulate per-window device vectors and fetch once at the end: per-batch
    # float() would hard-sync the host into every dispatch (the tunnel makes
    # that especially costly); this keeps all eval batches in flight.  Padded
    # windows contribute exact zeros, and the final reduction is math.fsum
    # (order-exact), so the reported numbers are bit-identical at any batch
    # size or mesh rounding (tests/test_evaluate.py pins equality).
    sums = []

    def run_windows(fn, sel, n_b, bs):
        """Evaluate the windows in ``sel`` (original dataset indices) at
        agent capacity ``n_b`` in fixed batches of ``bs``, appending the
        per-window sum vectors.  Valid agents occupy a contiguous prefix
        (collate.pad_windows), so slicing to the first n_b slots keeps every
        agent of a window whose count fits — the bucket router guarantees
        that.  win_idx carries ORIGINAL window indices: the per-window RNG
        fold_in(seed_key, w) is what makes bucketed == padded exact."""
        for s in range(0, len(sel), bs):
            idx = sel[s : s + bs]
            xy, mask = test_ds.batch(idx)
            xy, mask = xy[:, :n_b], mask[:, :n_b]
            if len(idx) < bs:  # pad to fixed shape with invalid windows
                pad = bs - len(idx)
                xy = np.concatenate(
                    [xy, np.zeros((pad,) + xy.shape[1:], xy.dtype)])
                mask = np.concatenate(
                    [mask, np.zeros((pad,) + mask.shape[1:], bool)])
            win_idx = jnp.asarray(
                np.pad(np.asarray(idx, np.int32), (0, bs - len(idx))))
            sums.append(fn(params, jnp.asarray(xy), jnp.asarray(mask),
                           win_idx, mean, std, key))

    buckets_used = None
    if buckets is None:
        fn = _eval_sums(model, k, mesh, reduction, float(sigma_scale), rollout,
                        int(oversample), int(ensemble), int(tta))
        run_windows(fn, np.arange(n), test_ds.n_max, batch_size)
    else:
        # Occupancy-aware shape buckets (VERDICT r4 #1): route each window to
        # the smallest compiled capacity that holds its agents.  A sparse
        # 6-agent window then pays a 16-wide attend chain instead of the full
        # n_max^2 one; metrics stay EXACTLY the padded path's because (a) the
        # per-window RNG is drawn at the canonical n_max and sliced
        # (_per_window_stream draw_n) and (b) masked padding never changes
        # valid agents' outputs (tests/test_gat.py) — pinned end-to-end by
        # tests/test_evaluate.py::test_bucketed_equals_padded.
        n_cap = test_ds.n_max
        bks = sorted({int(b) for b in buckets if 0 < int(b) <= n_cap})
        if not bks or bks[-1] != n_cap:
            bks.append(n_cap)  # the full capacity is always the last resort
        counts = test_ds.mask.sum(axis=1)
        route = np.searchsorted(bks, counts, side="left")  # smallest fit
        buckets_used = [int(b) for b in bks]
        for bi, n_b in enumerate(bks):
            sel = np.nonzero(route == bi)[0]
            if len(sel) == 0:
                continue
            # draw_n=None at full capacity keeps that bucket's program
            # byte-identical to the plain path (compile-cache shared).
            fn = _eval_sums(model, k, mesh, reduction, float(sigma_scale),
                            rollout, int(oversample), int(ensemble), int(tta),
                            draw_n=None if n_b == n_cap else n_cap)
            if explicit_batch:
                bs = batch_size
            else:
                bs = vmem_friendly_batch(
                    k * oversample * ensemble * tta, n_b,
                    bytes_per_elem=_model_bytes_per_elem(model))
                if mesh is not None:
                    bs *= mesh.size
            if mesh is not None:
                bs += (-bs) % mesh.size
            run_windows(fn, sel, n_b, bs)
    import math

    per_window = [
        np.concatenate([np.asarray(t, np.float64) for t in parts])
        for parts in zip(*map(jax.device_get, sums))
    ] if sums else [np.zeros(0)] * 7
    ade_sum, fde_sum, miss_sum, coll_sum, nll_sum, n_agents, n_win = (
        math.fsum(a) for a in per_window
    )
    n_agents = max(n_agents, 1.0)
    # ADE/FDE divide by the reduction's own population (agents or windows);
    # miss/collision/NLL are per-agent metrics under either protocol.
    primary = max(n_win, 1.0) if reduction == "per_window" else n_agents
    return {
        "min_ade": ade_sum / primary,
        "min_fde": fde_sum / primary,
        "miss_rate_2m": miss_sum / n_agents,
        "collision_rate": coll_sum / n_agents,
        "nll": nll_sum / n_agents,
        "k": k,
        "reduction": reduction,
        "n_windows": n,
        "n_agents": int(n_agents),
        "n_dropped": n_dropped,
        **({"sigma_scale": float(sigma_scale)} if sigma_scale != 1.0 else {}),
        **({"rollout": rollout} if rollout != "sample" else {}),
        **({"oversample": int(oversample)} if oversample > 1 else {}),
        **({"ensemble": int(ensemble)} if ensemble > 1 else {}),
        **({"tta": int(tta)} if tta > 1 else {}),
        **({"buckets": buckets_used} if buckets_used is not None else {}),
    }

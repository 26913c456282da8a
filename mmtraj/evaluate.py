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
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmtraj.data.collate import WindowDataset
from mmtraj.data.transforms import NormStats
from mmtraj.metrics import collision_rate, displacement_errors, miss_rate
from mmtraj.models.gmm import nll as gmm_nll
from mmtraj.models.forecaster import Forecaster


@functools.lru_cache(maxsize=32)
def _eval_sums(model: Forecaster, k: int, mesh=None):
    """Jittable per-batch evaluator -> (min_ade_sum, min_fde_sum, n_valid).

    Cached per (model, k, mesh): periodic eval during training must reuse the
    compiled program, not re-jit each call (Forecaster is hashable: it wraps
    a frozen config + ints).  With a mesh the batch is sharded over 'data'
    (each chip rolls out its slice of windows for all K samples) and the
    masked sums reduce over ICI — the same SPMD shape as training
    (BASELINE.json:11)."""

    def fn(params, xy, mask, stats_mean, stats_std, key):
        stats = NormStats(stats_mean, stats_std)
        obs = xy[:, :, : model.obs_len]
        gt = xy[:, :, model.obs_len :]
        carry = model.encode(params, obs, mask, stats)  # shared: rollout + NLL
        preds = model.rollout_k(params, obs, mask, stats, key, k, carry=carry)
        ade_k, fde_k = displacement_errors(preds, gt[None])  # (K,B,N)
        ade = ade_k.min(axis=0)
        fde = fde_k.min(axis=0)
        m = mask.astype(jnp.float32)
        miss = miss_rate(preds, gt, mask) * m.sum()  # MR-K@2m numerator
        coll = collision_rate(preds, mask) * m.sum()  # per-agent-normalized
        # Predictive NLL of the ground-truth future under the (teacher-forced)
        # per-step mixture — the probabilistic-quality metric; 0 for
        # deterministic heads.
        if model.cfg.head == "gmm":
            from mmtraj.data.transforms import normalize, to_relative

            dxy_n = normalize(to_relative(xy), stats)[:, :, model.obs_len:]
            outs = model.decode_teacher(params, carry, gt, dxy_n, mask)
            per_step = gmm_nll(outs, dxy_n)  # (B, N, Tp)
            nll = (per_step.mean(axis=-1) * m).sum()
        else:
            nll = jnp.zeros(())
        return (ade * m).sum(), (fde * m).sum(), miss, coll, nll, m.sum()

    if mesh is None:
        return jax.jit(fn)
    from mmtraj.parallel.mesh import batch_sharding, replicated

    rep, shd = replicated(mesh), batch_sharding(mesh)
    return jax.jit(
        fn,
        in_shardings=(rep, shd, shd, rep, rep, rep),
        out_shardings=(rep,) * 6,
    )


def evaluate(
    model: Forecaster,
    params,
    stats: NormStats,
    test_ds: WindowDataset,
    k: int = 20,
    batch_size: int = 64,
    seed: int = 0,
    mesh=None,
) -> Dict[str, float]:
    """Full-test-set best-of-K ADE/FDE in world meters.

    ``mesh``: optional jax Mesh; shards each eval batch over its 'data' axis
    (batch_size is rounded up to a multiple of the mesh size)."""
    if mesh is not None:
        batch_size += (-batch_size) % mesh.size
    fn = _eval_sums(model, k, mesh)
    key = jax.random.PRNGKey(seed)
    n = len(test_ds)
    mean = jnp.asarray(stats.mean)
    std = jnp.asarray(stats.std)
    # Accumulate device scalars and fetch once at the end: per-batch float()
    # would hard-sync the host into every dispatch (the tunnel makes that
    # especially costly); this keeps all eval batches in flight.
    sums = []
    for s in range(0, n, batch_size):
        idx = np.arange(s, min(s + batch_size, n))
        xy, mask = test_ds.batch(idx)
        if len(idx) < batch_size:  # pad to fixed shape with invalid windows
            pad = batch_size - len(idx)
            xy = np.concatenate([xy, np.zeros((pad,) + xy.shape[1:], xy.dtype)])
            mask = np.concatenate([mask, np.zeros((pad,) + mask.shape[1:], bool)])
        key, sub = jax.random.split(key)
        sums.append(fn(params, jnp.asarray(xy), jnp.asarray(mask), mean, std, sub))
    totals = np.asarray(jax.device_get(sums), dtype=np.float64).sum(axis=0) if sums else np.zeros(6)
    ade_sum, fde_sum, miss_sum, coll_sum, nll_sum, count = totals
    count = max(count, 1.0)
    return {
        "min_ade": ade_sum / count,
        "min_fde": fde_sum / count,
        "miss_rate_2m": miss_sum / count,
        "collision_rate": coll_sum / count,
        "nll": nll_sum / count,
        "k": k,
        "n_windows": n,
        "n_agents": int(count),
    }

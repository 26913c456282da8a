"""Dense-rung design sweep report (VERDICT r4 next-round #6).

Evaluates the univ-fold trees experiments/dense_sweep.sh trained — head
capacity at fixed head-dim (hidden=128 x 4 heads), GAT depth
(gat_layers=2), adjacency radius {2, 4, 8} ON the dense fold, and the
N_max=128 regime — with the full metric set under the exact-invariant
protocol (EMA, K=20, seed 0), both i.i.d. and the submitted oversample-6
20-set, mean±std over training seeds.  Table lands in RESULTS.md
"Dense-rung design sweep (round 5)".
"""
import math
import os
import sys

from mmtraj.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from mmtraj import checkpoint as ckpt_lib
from mmtraj.data.collate import WindowDataset
from mmtraj.data.registry import load_split
from mmtraj.evaluate import evaluate
from mmtraj.models.forecaster import Forecaster

METRICS = ("min_ade", "min_fde", "miss_rate_2m", "collision_rate")
_ds_cache = {}

CELLS = [
    # (tag, tree, seeds)
    ("control h64 4h r4", "runs/r5/dense_control", (0, 1, 2)),
    ("hidden=128 4h (hd32)", "runs/r5/dense_h128_heads4", (0, 1, 2)),
    ("gat_layers=2", "runs/r5/dense_gat2", (0, 1, 2)),
    ("radius=2", "runs/r5/dense_rad2", (0, 1, 2)),
    ("radius=8", "runs/r5/dense_rad8", (0, 1, 2)),
    ("n_max=128", "runs/r5/dense_n128", (0,)),
]


def eval_fold(tree, seed, oversample):
    path = os.path.join(tree, f"s{seed}", "checkpoint_ema.npz")
    if not os.path.exists(path):  # single-seed runs write a flat tree
        path = os.path.join(tree, "checkpoint_ema.npz")
    ck = ckpt_lib.load(path)
    cfg = ck.config
    key = (cfg.data.obs_len, cfg.data.pred_len, cfg.data.n_max)
    if key not in _ds_cache:
        _, test_w = load_split("data/synthetic", "univ", cfg.data.obs_len,
                               cfg.data.pred_len, cfg.data.stride,
                               cfg.data.min_agents)
        _ds_cache[key] = WindowDataset(test_w, cfg.data.n_max)
    model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
    m = evaluate(model, ck.params, ck.stats, _ds_cache[key], 20, seed=0,
                 oversample=oversample)
    return {k: float(m[k]) for k in METRICS}


def seed_stats(tree, seeds, oversample):
    rows = [eval_fold(tree, s, oversample) for s in seeds]
    out = {}
    for k in METRICS:
        vals = [r[k] for r in rows]
        mu = math.fsum(vals) / len(vals)
        sd = (math.fsum((v - mu) ** 2 for v in vals) / len(vals)) ** 0.5
        out[k] = (mu, sd)
    return out


def main():
    for oversample, label in ((1, "i.i.d. K=20"), (6, "oversample-6")):
        print(f"\n=== univ fold, {label} (EMA, exact-invariant eval, "
              f"mean±std over seeds) ===")
        for tag, tree, seeds in CELLS:
            if not os.path.isdir(tree):
                print(f"{tag:22s} (missing: {tree})")
                continue
            st = seed_stats(tree, seeds, oversample)
            print(f"{tag:22s} "
                  f"ADE={st['min_ade'][0]:.4f}±{st['min_ade'][1]:.4f} "
                  f"FDE={st['min_fde'][0]:.4f}±{st['min_fde'][1]:.4f} "
                  f"MR@2m={st['miss_rate_2m'][0]:.4f}±{st['miss_rate_2m'][1]:.4f} "
                  f"coll={st['collision_rate'][0]:.4f}±{st['collision_rate'][1]:.4f}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Social-graph ablation report (VERDICT r3 next-round #1).

Evaluates the ablation trees experiments/social_ablation.sh trained against
their social=True counterparts, with the FULL metric set (ADE/FDE, MR@2m,
collision rate) under the exact-invariant protocol (EMA, K=20, seed 0),
mean±std over training seeds 0-2.  Table lands in RESULTS.md
"Social-graph ablation".

  A. social on/off      — 5 folds; on = runs/r3/loo32k_variety (s0-s2)
  B. adjacency radius   — zara1 fold: 2 / 4 (=the r3 tree) / 8 / inf
  C. num_heads 1 vs 4   — config-4 dense rung, univ fold
"""
import math
import os

from mmtraj.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from mmtraj import checkpoint as ckpt_lib
from mmtraj.data.collate import WindowDataset
from mmtraj.data.registry import load_split
from mmtraj.evaluate import evaluate
from mmtraj.models.forecaster import Forecaster

SCENES = ["eth", "hotel", "univ", "zara1", "zara2"]
SEEDS = [0, 1, 2]
METRICS = ("min_ade", "min_fde", "miss_rate_2m", "collision_rate")
_ds_cache = {}


def eval_fold(tree, scene, seed):
    ck = ckpt_lib.load(os.path.join(tree, f"s{seed}", scene,
                                    "checkpoint_ema.npz"))
    cfg = ck.config
    key = (scene, cfg.data.obs_len, cfg.data.pred_len, cfg.data.n_max)
    if key not in _ds_cache:
        _, test_w = load_split("data/synthetic", scene, cfg.data.obs_len,
                               cfg.data.pred_len, cfg.data.stride,
                               cfg.data.min_agents)
        _ds_cache[key] = WindowDataset(test_w, cfg.data.n_max)
    model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
    m = evaluate(model, ck.params, ck.stats, _ds_cache[key], 20, seed=0)
    return {k: float(m[k]) for k in METRICS}


def seed_stats(tree, scene):
    rows = [eval_fold(tree, scene, s) for s in SEEDS]
    out = {}
    for k in METRICS:
        vals = [r[k] for r in rows]
        mu = math.fsum(vals) / len(vals)
        sd = (math.fsum((v - mu) ** 2 for v in vals) / len(vals)) ** 0.5
        out[k] = (mu, sd)
    return out


def show(tag, stats):
    print(f"{tag:26s} "
          f"ADE={stats['min_ade'][0]:.4f}±{stats['min_ade'][1]:.4f} "
          f"FDE={stats['min_fde'][0]:.4f}±{stats['min_fde'][1]:.4f} "
          f"MR@2m={stats['miss_rate_2m'][0]:.4f}±{stats['miss_rate_2m'][1]:.4f} "
          f"coll={stats['collision_rate'][0]:.4f}±{stats['collision_rate'][1]:.4f}",
          flush=True)


print("=== A. social on/off, per fold (WTA-32k, seeds 0-2, EMA, K=20) ===")
acc = {"on": {k: [] for k in METRICS}, "off": {k: [] for k in METRICS}}
for scene in SCENES:
    on = seed_stats("runs/r3/loo32k_variety", scene)
    off = seed_stats("runs/r4/loo32k_nosocial", scene)
    show(f"{scene} social=True", on)
    show(f"{scene} social=False", off)
    for k in METRICS:
        acc["on"][k].append(on[k][0])
        acc["off"][k].append(off[k][0])
for tag in ("on", "off"):
    avg = {k: (math.fsum(v) / len(v), 0.0) for k, v in acc[tag].items()}
    show(f"AVG social={'True' if tag == 'on' else 'False'}", avg)

print("\n=== B. adjacency radius, zara1 fold (4.0 = the r3 tree) ===")
show("radius=4.0 (default)", seed_stats("runs/r3/loo32k_variety", "zara1"))
for r, tree in (("2", "runs/r4/rad2_zara1"), ("8", "runs/r4/rad8_zara1"),
                ("inf", "runs/r4/rad0_zara1")):
    stats = {}
    rows = []
    for s in SEEDS:
        ck = ckpt_lib.load(os.path.join(tree, f"s{s}", "checkpoint_ema.npz"))
        cfg = ck.config
        key = ("zara1", cfg.data.obs_len, cfg.data.pred_len, cfg.data.n_max)
        if key not in _ds_cache:
            _, test_w = load_split("data/synthetic", "zara1",
                                   cfg.data.obs_len, cfg.data.pred_len,
                                   cfg.data.stride, cfg.data.min_agents)
            _ds_cache[key] = WindowDataset(test_w, cfg.data.n_max)
        model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
        m = evaluate(model, ck.params, ck.stats, _ds_cache[key], 20, seed=0)
        rows.append({k: float(m[k]) for k in METRICS})
    for k in METRICS:
        vals = [x[k] for x in rows]
        mu = math.fsum(vals) / len(vals)
        sd = (math.fsum((v - mu) ** 2 for v in vals) / len(vals)) ** 0.5
        stats[k] = (mu, sd)
    show(f"radius={r}", stats)

print("\n=== C. num_heads, config-4 dense rung (univ fold) ===")
for h, tree in (("1", "runs/r4/c4_univ_h1"), ("4", "runs/r4/c4_univ_h4")):
    stats = {}
    rows = []
    for s in SEEDS:
        ck = ckpt_lib.load(os.path.join(tree, f"s{s}", "checkpoint_ema.npz"))
        cfg = ck.config
        key = ("univ", cfg.data.obs_len, cfg.data.pred_len, cfg.data.n_max)
        if key not in _ds_cache:
            _, test_w = load_split("data/synthetic", "univ",
                                   cfg.data.obs_len, cfg.data.pred_len,
                                   cfg.data.stride, cfg.data.min_agents)
            _ds_cache[key] = WindowDataset(test_w, cfg.data.n_max)
        model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
        m = evaluate(model, ck.params, ck.stats, _ds_cache[key], 20, seed=0)
        rows.append({k: float(m[k]) for k in METRICS})
    for k in METRICS:
        vals = [x[k] for x in rows]
        mu = math.fsum(vals) / len(vals)
        sd = (math.fsum((v - mu) ** 2 for v in vals) / len(vals)) ** 0.5
        stats[k] = (mu, sd)
    show(f"num_heads={h}", stats)

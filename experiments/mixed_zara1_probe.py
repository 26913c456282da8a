"""Measure heterogeneous (rnn+attn) ensemble quality on the zara1 fold.

Members are the round-3 calibration checkpoints (same WTA-32k recipe,
seed 0).  Single-member rows reproduce the recorded RESULTS.md numbers as a
harness sanity check; mixed rows answer: does FAMILY diversity beat the same
candidate budget spent on one family?
"""
import time

from mmtraj import checkpoint as ckpt_lib
from mmtraj.data.collate import WindowDataset
from mmtraj.data.registry import load_split
from mmtraj.evaluate import evaluate, evaluate_mixed
from mmtraj.models.forecaster import Forecaster

CKPTS = {
    "rnn": "runs/r3/rnn_zara1_s0/checkpoint_ema.npz",
    "attn3": "runs/r3/probe_attn_l3/checkpoint_ema.npz",
    "attn4": "runs/r3/probe_attn_l4/checkpoint_ema.npz",
}
loaded = {k: ckpt_lib.load(p) for k, p in CKPTS.items()}
cfg = loaded["rnn"].config
_, test_w = load_split("data/synthetic", cfg.data.scene, cfg.data.obs_len,
                       cfg.data.pred_len, cfg.data.stride, cfg.data.min_agents)
ds = WindowDataset(test_w, cfg.data.n_max)
print(f"zara1 fold: {len(ds)} test windows, n_max={ds.n_max}")


def member(name):
    c = loaded[name]
    return Forecaster(c.config.model, c.config.data.obs_len,
                      c.config.data.pred_len), c.params


def run(tag, names, oversample):
    t0 = time.time()
    members = [member(n) for n in names]
    if len(members) == 1:
        model, params = members[0]
        m = evaluate(model, params, loaded[names[0]].stats, ds, 20,
                     seed=0, oversample=oversample)
    else:
        m = evaluate_mixed(members, loaded[names[0]].stats, ds, 20,
                           seed=0, oversample=oversample)
    print(f"{tag:28s} os={oversample}  ADE={m['min_ade']:.4f}  "
          f"FDE={m['min_fde']:.4f}  MR@2m={m['miss_rate_2m']:.4f}  "
          f"({time.time()-t0:.0f}s)", flush=True)


# Sanity: reproduce the recorded single-member rows.
run("rnn (recorded .3474/.4979)", ["rnn"], 6)
run("attn3 (recorded .3496/.5091)", ["attn3"], 6)
# Family diversity at the SAME 120-candidate budget as os-6:
run("mixed rnn+attn3", ["rnn", "attn3"], 3)
# Larger pools:
run("mixed rnn+attn3", ["rnn", "attn3"], 6)
run("mixed rnn+attn3+attn4", ["rnn", "attn3", "attn4"], 2)
run("mixed rnn+attn3+attn4", ["rnn", "attn3", "attn4"], 4)
# Homogeneous-family control at 2 members is impossible (one seed per
# family exists), so also record each family alone at os-3 for the
# 60-candidate-per-member comparison.
run("rnn alone", ["rnn"], 3)
run("attn3 alone", ["attn3"], 3)

"""Scale-out quality report (VERDICT r4 next-round #4).

Uniformly evaluates the experiments/scale_quality.sh trees (EMA,
exact-invariant protocol, i.i.d. K=20 and os-6) plus the 600-frame control
(runs/r5/dense_control s0), and extracts each run's recorded training wall
clock from its metrics.jsonl, so the RESULTS table can state quality vs
data volume vs batch WITH wall-clock accounting.
"""
import json
import os
import sys

from mmtraj.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from mmtraj import checkpoint as ckpt_lib
from mmtraj.data.collate import WindowDataset
from mmtraj.data.registry import load_split
from mmtraj.evaluate import evaluate
from mmtraj.models.forecaster import Forecaster

CELLS = [
    ("control B=16 600f 32k", "runs/r5/dense_control/s0"),
    ("B=16 3000f 32k", "runs/r5/scale_b16_f3000"),
    ("B=256 3000f 2k", "runs/r5/scale_b256_f3000_2k"),
    ("B=256 3000f 4k", "runs/r5/scale_b256_f3000_4k"),
    ("B=256 6000f 4k", "runs/r5/scale_b256_f6000_4k"),
]
_ds_cache = {}


def wall_of(tree):
    """Last logged t= (seconds) in the run's metrics.jsonl."""
    path = os.path.join(tree, "metrics.jsonl")
    if not os.path.exists(path):
        return None
    last = None
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            last = rec.get("t", last)
    return last


def main():
    print(f"{'cell':22s} {'wall(s)':>8s} {'iid ADE/FDE':>17s} "
          f"{'os-6 ADE/FDE':>17s}")
    for tag, tree in CELLS:
        if not os.path.isdir(tree):
            print(f"{tag:22s} (missing)")
            continue
        ck = ckpt_lib.load(os.path.join(tree, "checkpoint_ema.npz"))
        cfg = ck.config
        key = cfg.data.n_max
        if key not in _ds_cache:
            # Held-out univ windows come from the CONTROL data dir: the
            # held-out scene is never trained on, so the 600-frame test set
            # is the common yardstick every cell is scored against.
            _, test_w = load_split("data/synthetic", "univ", cfg.data.obs_len,
                                   cfg.data.pred_len, cfg.data.stride,
                                   cfg.data.min_agents)
            _ds_cache[key] = WindowDataset(test_w, cfg.data.n_max)
        model = Forecaster(cfg.model, cfg.data.obs_len, cfg.data.pred_len)
        mi = evaluate(model, ck.params, ck.stats, _ds_cache[key], 20, seed=0)
        mo = evaluate(model, ck.params, ck.stats, _ds_cache[key], 20, seed=0,
                      oversample=6)
        w = wall_of(tree)
        print(f"{tag:22s} {w if w is not None else float('nan'):8.0f} "
              f"{mi['min_ade']:.4f}/{mi['min_fde']:.4f}   "
              f"{mo['min_ade']:.4f}/{mo['min_fde']:.4f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

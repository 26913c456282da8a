"""Does adding attn members improve the recorded ens5 headline (0.3539/0.5031)?

Rows per fold: rnn ens5 control (must reproduce the recorded headline rows —
seeds 3/4 rebuilt bit-identically), ens5 + 1 attn (6 members, 120
candidates), ens5 + 3 attn (8 members, 160 candidates)."""
import math
import time

from mmtraj.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from mmtraj import checkpoint as ckpt_lib
from mmtraj.data.collate import WindowDataset
from mmtraj.data.registry import load_split
from mmtraj.evaluate import evaluate, evaluate_mixed
from mmtraj.models.forecaster import Forecaster

SCENES = ["eth", "hotel", "univ", "zara1", "zara2"]
RNN = [f"runs/r3/loo32k_variety/s{s}/%s/checkpoint_ema.npz" for s in range(5)]
ATTN = ["runs/r3/loo32k_attn/s0/%s/checkpoint_ema.npz",
        "runs/r3/loo32k_attn/s1/%s/checkpoint_ema.npz",
        "runs/r3/loo32k_attn/%s/checkpoint_ema.npz"]
RECORDED_ENS5 = {"eth": (0.3069, 0.4448), "hotel": (0.2865, 0.4325),
                 "univ": (0.4691, 0.6356), "zara1": (0.3442, 0.4899),
                 "zara2": (0.3626, 0.5126)}

rows = {"rnn ens5": [], "ens5+attn1": [], "ens5+attn3": []}
for scene in SCENES:
    t0 = time.time()
    rnn = [ckpt_lib.load(p % scene) for p in RNN]
    attn = [ckpt_lib.load(p % scene) for p in ATTN]
    cfg = rnn[0].config
    _, test_w = load_split("data/synthetic", scene, cfg.data.obs_len,
                           cfg.data.pred_len, cfg.data.stride,
                           cfg.data.min_agents)
    ds = WindowDataset(test_w, cfg.data.n_max)

    def member(c):
        return Forecaster(c.config.model, c.config.data.obs_len,
                          c.config.data.pred_len), c.params

    m5 = evaluate(member(rnn[0])[0], [c.params for c in rnn],
                  rnn[0].stats, ds, 20, seed=0)
    ra, rf = RECORDED_ENS5[scene]
    print(f"{scene:8s} rnn ens5     ADE={m5['min_ade']:.4f} "
          f"FDE={m5['min_fde']:.4f} MR={m5['miss_rate_2m']:.4f} "
          f"(recorded {ra:.4f}/{rf:.4f} "
          f"d={m5['min_ade']-ra:+.4f}/{m5['min_fde']-rf:+.4f})", flush=True)
    m6 = evaluate_mixed([member(c) for c in rnn + attn[:1]],
                        rnn[0].stats, ds, 20, seed=0)
    m8 = evaluate_mixed([member(c) for c in rnn + attn],
                        rnn[0].stats, ds, 20, seed=0)
    for tag, m in (("ens5+attn1", m6), ("ens5+attn3", m8)):
        print(f"{scene:8s} {tag:12s} ADE={m['min_ade']:.4f} "
              f"FDE={m['min_fde']:.4f} MR={m['miss_rate_2m']:.4f}",
              flush=True)
    rows["rnn ens5"].append((m5["min_ade"], m5["min_fde"]))
    rows["ens5+attn1"].append((m6["min_ade"], m6["min_fde"]))
    rows["ens5+attn3"].append((m8["min_ade"], m8["min_fde"]))
    print(f"  ({time.time()-t0:.0f}s)", flush=True)

print("\naverages over the 5 folds:")
for tag, vals in rows.items():
    a = math.fsum(v[0] for v in vals) / len(vals)
    f = math.fsum(v[1] for v in vals) / len(vals)
    print(f"{tag:12s} ADE={a:.4f} FDE={f:.4f}")
print("recorded rnn ens5 headline: 0.3539 / 0.5031")

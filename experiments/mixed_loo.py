"""Full 5-fold heterogeneous ensemble: rnn(3 seeds) + attn(3 seeds).

Uses the round-3 LOO trees on disk (same WTA-32k recipe):
  runs/r3/loo32k_variety/s{0,1,2}/<scene>/checkpoint_ema.npz   (rnn)
  runs/r3/loo32k_attn/{s0,s1,<flat>=seed2}/<scene>/checkpoint_ema.npz (attn-3L)
Controls: each family's own 3-seed ensemble.  Recorded headline for scale:
rnn ens5 = 0.3539/0.5031 (RESULTS.md; 2 of those 5 seeds no longer on disk).
"""
import math
import time

from mmtraj import checkpoint as ckpt_lib
from mmtraj.data.collate import WindowDataset
from mmtraj.data.registry import load_split
from mmtraj.evaluate import evaluate, evaluate_mixed
from mmtraj.models.forecaster import Forecaster

SCENES = ["eth", "hotel", "univ", "zara1", "zara2"]
RNN = ["runs/r3/loo32k_variety/s0/%s/checkpoint_ema.npz",
       "runs/r3/loo32k_variety/s1/%s/checkpoint_ema.npz",
       "runs/r3/loo32k_variety/s2/%s/checkpoint_ema.npz"]
ATTN = ["runs/r3/loo32k_attn/s0/%s/checkpoint_ema.npz",
        "runs/r3/loo32k_attn/s1/%s/checkpoint_ema.npz",
        "runs/r3/loo32k_attn/%s/checkpoint_ema.npz"]

rows = {"rnn ens3": [], "attn ens3": [], "mixed ens6": []}
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

    # Homogeneous controls ride the stacked-vmap path in evaluate().
    m_rnn = evaluate(member(rnn[0])[0], [c.params for c in rnn],
                     rnn[0].stats, ds, 20, seed=0)
    m_attn = evaluate(member(attn[0])[0], [c.params for c in attn],
                      attn[0].stats, ds, 20, seed=0)
    m_mix = evaluate_mixed([member(c) for c in rnn + attn],
                           rnn[0].stats, ds, 20, seed=0)
    for tag, m in (("rnn ens3", m_rnn), ("attn ens3", m_attn),
                   ("mixed ens6", m_mix)):
        rows[tag].append((m["min_ade"], m["min_fde"]))
        print(f"{scene:8s} {tag:12s} ADE={m['min_ade']:.4f} "
              f"FDE={m['min_fde']:.4f} MR={m['miss_rate_2m']:.4f}",
              flush=True)
    print(f"  ({time.time()-t0:.0f}s)", flush=True)

print("\naverages over the 5 folds:")
for tag, vals in rows.items():
    a = math.fsum(v[0] for v in vals) / len(vals)
    f = math.fsum(v[1] for v in vals) / len(vals)
    print(f"{tag:12s} ADE={a:.4f} FDE={f:.4f}")
print("recorded rnn ens5 headline: 0.3539 / 0.5031")

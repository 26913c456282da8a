#!/bin/bash
# Dense-rung design sweep on the univ fold (VERDICT r4 next-round #6): the
# hardest fold (~1.4x the 5-fold average) is exactly where the social graph
# earns its keep (-15% MR@2m, RESULTS.md ablation table A), yet the only r4
# architecture probe there was heads 1-vs-4 at hidden=64 — a wash.  Sweep
# what that wash did not: head count at fixed HEAD DIM (4x32 at hidden=128),
# GAT depth (gat_layers=2), adjacency radius ON univ, and the N_max=128
# regime (where the Pallas attend kernel auto-dispatches at eval).  All
# cells: config-4 univ fold, the WTA-32k quality recipe, seeds 0-2 (seed 0
# only for the N=128 capability cell).  Parity preset stays frozen unless a
# cell wins outside seed noise (RESULTS.md "Dense-rung design sweep").
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
RECIPE="--loss variety --variety-n 8 --augment --augment-flip --dropout 0.1
        --weight-decay 1e-4 --ema-decay 0.995 --lr-schedule cosine
        --steps 32000 --steps-per-dispatch 50 --data-dir data/synthetic"

echo "=== control: c4 univ h=64 heads=4 r=4 (re-trained under today's code) ==="
python -m mmtraj.cli train --config 4 --scene univ --seeds 0 1 2 \
    $RECIPE --out-dir runs/r5/dense_control

echo "=== A: hidden=128, heads=4 (head-dim 32 — the dense head-capacity cell) ==="
python -m mmtraj.cli train --config 4 --scene univ --seeds 0 1 2 \
    --hidden-dim 128 $RECIPE --out-dir runs/r5/dense_h128_heads4

echo "=== B: gat_layers=2 (2-hop social receptive field per frame) ==="
python -m mmtraj.cli train --config 4 --scene univ --seeds 0 1 2 \
    --gat-layers 2 $RECIPE --out-dir runs/r5/dense_gat2

echo "=== C/D: adjacency radius 2 / 8 on the dense fold ==="
for r in 2 8; do
    python -m mmtraj.cli train --config 4 --scene univ --seeds 0 1 2 \
        --adjacency-radius $r $RECIPE --out-dir runs/r5/dense_rad${r}
done

echo "=== E: N_max=128 trained (Pallas-attend eval regime), seed 0 ==="
python -m mmtraj.cli train --config 4 --scene univ --seeds 0 \
    --n-max 128 $RECIPE --out-dir runs/r5/dense_n128

echo "=== dense sweep training complete ==="

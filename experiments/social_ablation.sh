#!/bin/bash
# Social-graph ablation suite (VERDICT r3 next-round #1): measure what the
# reference's defining mechanism — per-frame social graphs + GAT message
# passing (BASELINE.json:5) — buys on the WTA-32k quality recipe.  The
# synthetic generator contains real pairwise repulsion (data/synthetic.py),
# so the signal is testable.  Three axes:
#   A. social on/off      — full 5-fold LOO x seeds 0 1 2 (on = the recorded
#                           runs/r3/loo32k_variety tree; only OFF is trained)
#   B. adjacency_radius   — {2, 8, inf} on the zara1 fold x seeds 0 1 2
#                           (4 = the recorded tree's zara1 rows)
#   C. num_heads 1 vs 4   — config-4 dense rung (univ fold, N_max=64),
#                           seeds 0 1 2
# Results table: RESULTS.md "Social-graph ablation" (written by the round-4
# session from eval-loo over the trees this writes).
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
RECIPE="--loss variety --variety-n 8 --augment --augment-flip --dropout 0.1
        --weight-decay 1e-4 --ema-decay 0.995 --lr-schedule cosine
        --steps 32000 --steps-per-dispatch 50 --data-dir data/synthetic"

echo "=== A. social=False, full 5-fold LOO, seeds 0 1 2 ==="
python -m mmtraj.cli train --config 3 --scene all --seeds 0 1 2 \
    --no-social $RECIPE --out-dir runs/r4/loo32k_nosocial

echo "=== B. adjacency radius sweep, zara1 fold, seeds 0 1 2 ==="
for r in 2 8 0; do
    python -m mmtraj.cli train --config 3 --scene zara1 --seeds 0 1 2 \
        --adjacency-radius $r $RECIPE --out-dir runs/r4/rad${r}_zara1
done

echo "=== C. num_heads 1 vs 4, config-4 dense rung (univ), seeds 0 1 2 ==="
for h in 1 4; do
    python -m mmtraj.cli train --config 4 --scene univ --seeds 0 1 2 \
        --num-heads $h $RECIPE --out-dir runs/r4/c4_univ_h${h}
done
echo "=== ablation training complete ==="

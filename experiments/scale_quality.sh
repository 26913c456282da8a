#!/bin/bash
# Scale-out rung: does scale buy QUALITY, not just steps/s? (VERDICT r4 #4)
#
# BASELINE.json:11's config 5 is "large-batch multi-scene training"; every
# number recorded for it so far is throughput (DP parity, steps/s).  This
# experiment varies the two scale axes it exists for — data volume
# (synthetic frames/scene: 600 control vs 3000/6000 = 5x/10x) and batch
# (config-4's B=16 vs config-5's B=256) — under the WTA quality recipe on
# the univ fold, and records ADE/FDE + wall-clock per cell so the report
# can compare at matched wall.  Row pairs:
#   control    B=16  600f   32k steps   (= runs/r5/dense_control s0, reused)
#   data5x     B=16  3000f  32k steps   (data axis alone)
#   big-batch  B=256 3000f  2k steps    (same 512k gradient windows as 32k@16)
#   big-batch+ B=256 3000f  4k steps    (2x compute at large batch)
#   data10x    B=256 6000f  4k steps    (data axis at large batch)
# An honest negative ("quality saturates at 600 frames") is an acceptable
# outcome; the point is evidence either way.  Cosine schedules stretch with
# --steps, so rows are different recipes, not truncations.
# Results: RESULTS.md "Scale-out rung: quality vs data volume and batch".
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
RECIPE="--loss variety --variety-n 8 --augment --augment-flip --dropout 0.1
        --weight-decay 1e-4 --ema-decay 0.995 --lr-schedule cosine
        --steps-per-dispatch 50"

for f in 3000 6000; do
    if [ ! -f data/synthetic${f}/eth.txt ]; then
        python -m mmtraj.cli generate-data --data-dir data/synthetic${f} \
            --seed 0 --n-frames ${f}
    fi
done

echo "=== data5x: B=16, 3000 frames, 32k steps ==="
python -m mmtraj.cli train --config 4 --scene univ --seeds 0 \
    --steps 32000 $RECIPE --data-dir data/synthetic3000 \
    --out-dir runs/r5/scale_b16_f3000

echo "=== big-batch: B=256 (config-5 shape), 3000 frames, 2k steps ==="
python -m mmtraj.cli train --config 5 --scene univ --seeds 0 \
    --steps 2000 $RECIPE --data-dir data/synthetic3000 \
    --out-dir runs/r5/scale_b256_f3000_2k

echo "=== big-batch+: B=256, 3000 frames, 4k steps ==="
python -m mmtraj.cli train --config 5 --scene univ --seeds 0 \
    --steps 4000 $RECIPE --data-dir data/synthetic3000 \
    --out-dir runs/r5/scale_b256_f3000_4k

echo "=== data10x: B=256, 6000 frames, 4k steps ==="
python -m mmtraj.cli train --config 5 --scene univ --seeds 0 \
    --steps 4000 $RECIPE --data-dir data/synthetic6000 \
    --out-dir runs/r5/scale_b256_f6000_4k

echo "=== scale-quality training complete ==="

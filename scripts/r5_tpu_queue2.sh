#!/bin/bash
# Round-5 TPU queue, part 2 — chained behind the measurement batch
# (r5_tpu_measurements.sh) so TPU jobs never overlap:
#   1. Full bench.py protocol: warms the persistent compile cache for
#      the 8 new chunk-policy bucket shapes the driver's round-end
#      bench will hit (Mosaic compiles are minutes per shape cold), and
#      captures the first post-bucket-change interleaved A/B +
#      self-certifying encode row.
#   2. Ours-side demo2pub seeds 11..31 (tilted-uniform ignition-rate
#      n>=10 per side, PARITY.md §6).
# Usage: r5_tpu_queue2.sh [wait_pid]
set -u
cd "$(dirname "$0")/.."

wait_pid="${1:-}"
if [ -n "$wait_pid" ] && kill -0 "$wait_pid" 2>/dev/null; then
  echo "waiting for PID $wait_pid..."
  while kill -0 "$wait_pid" 2>/dev/null; do sleep 60; done
fi
echo "=== bench ($(date +%H:%M:%S))"
timeout 7200 python bench.py > /tmp/bench_r5_warm.json 2> /tmp/bench_r5_warm.log \
  || echo "bench FAILED rc=$?"

for s in 11 13 17 19 23 29 31; do
  out="parity_runs/ours_demo2pub_base_s${s}.json"
  [ -f "$out" ] && { echo "skip $out"; continue; }
  echo "=== ours demo2pub seed $s ($(date +%H:%M:%S))"
  timeout 3000 python scripts/parity_run.py \
    --corpus demo2 --segments 800 --batch_size 512 --hidden 256 \
    -K 128 --feature_dim 256 --epochs 20 --pretrain_epochs 5 \
    --speaker_embed_dim 256 --corpus_seed 0 --seed "$s" \
    --skip_reference --device tpu --out_name "$out" \
    > "/tmp/ours_demo2pub_base_s${s}.log" 2>&1 \
    || echo "FAILED $out rc=$?"
done
echo "tpu queue2 done ($(date))"

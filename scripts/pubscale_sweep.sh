#!/bin/bash
# Publication-scale ignition sweep (round-4 VERDICT item 4 fallback):
# K=128, batch 512, hidden 256, f=256 — the Morita et al. config — on
# 1024-segment toyaug corpora at dose 0 (replication) and dose 1
# (gain-only distinct).  Our runs on the TPU, reference runs on CPU
# (~25 min/seed at its measured 17.45 seg/s).  Serialize everything:
# one CPU core.
#
# Usage: bash scripts/pubscale_sweep.sh ours|ref [seeds...]
set -u
cd "$(dirname "$0")/.."
side="${1:-ours}"; shift || true
seeds=("$@")
[ ${#seeds[@]} -eq 0 ] && seeds=(1111 2222 9999 12345 13579)

common=(--segments 1024 --batch_size 512 --hidden 256 -K 128
        --feature_dim 256 --epochs 20 --pretrain_epochs 5
        --corpus toyaug --corpus_seed 0)
for dose in 0 1; do
  if [ "$dose" = 0 ]; then strength=(0.0 0.0 0.0); else strength=(0.4 0.0 0.0); fi
  for seed in "${seeds[@]}"; do
    out="parity_runs/${side}_pub${dose}_s${seed}.json"
    [ -f "$out" ] && { echo "skip $out (exists)"; continue; }
    if [ "$side" = ours ]; then
      flags=(--skip_reference --device tpu)
    else
      flags=(--skip_ours --device cpu)
    fi
    echo "=== $side dose$dose seed$seed -> $out"
    timeout 5400 python scripts/parity_run.py "${common[@]}" \
      --toyaug_strength "${strength[@]}" --seed "$seed" \
      "${flags[@]}" --out_name "$out" || echo "FAILED $out rc=$?"
  done
done

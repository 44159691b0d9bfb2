#!/bin/bash
# Round-5 committed-regime hunt at publication scale (VERDICT r4 item 1).
#
# DEMO.json shows the ABCD head committing (ARI up to 0.80) on the demo2
# chirp/noise corpus at the FULL Morita publication config (K=128,
# batch 512, h=256, f=256, speaker_embed 256) — but via demo_synthetic.py
# with ours-only knobs (length_sorted batch composition, bf16 matmuls).
# This sweep re-runs demo2-publication through parity_run.py (so
# assignments are cross-framework comparable on the identical corpus) and
# walks the knob grid from reference-expressible semantics outward:
#   A: parity defaults (uniform order, matmul highest) x demo-winner seeds
#   B: matmul default (bf16 — precision is an implementation detail,
#      still reference-expressible as a config)
#   C: --greedy_decoder — the reference's own WORKING anti-collapse
#      option (learning.py:380)
#   D: --bidirectional_decoder — the reference's DOCUMENTED anti-collapse
#      option (learning.py:386; unrunnable in the unmodified reference,
#      model.py:224/:258 — ours-only evidence)
#   E: length_sorted composition (ours-only ordering; isolates whether
#      the DEMO commits needed it)
# Usage: bash scripts/demo2pub_sweep.sh [phase ...]   (default: A B C D E)
set -u
cd "$(dirname "$0")/.."
phases=("$@"); [ ${#phases[@]} -eq 0 ] && phases=(A B C D E)

common=(--corpus demo2 --segments 800 --batch_size 512 --hidden 256
        -K 128 --feature_dim 256 --epochs 20 --pretrain_epochs 5
        --speaker_embed_dim 256 --corpus_seed 0
        --skip_reference --device tpu)

run() { # run <name> <seed> [extra flags...]
  local name="$1" seed="$2"; shift 2
  local out="parity_runs/ours_demo2pub_${name}_s${seed}.json"
  [ -f "$out" ] && { echo "skip $out"; return; }
  echo "=== $name seed $seed -> $out"
  timeout 3000 python scripts/parity_run.py "${common[@]}" \
    --seed "$seed" "$@" --out_name "$out" \
    > "/tmp/ours_demo2pub_${name}_s${seed}.log" 2>&1 \
    || echo "FAILED $out rc=$?"
}

for ph in "${phases[@]}"; do case "$ph" in
  A) for s in 2 3 5 7; do run base "$s"; done ;;
  B) for s in 5 7; do run bf16 "$s" --matmul_precision default; done ;;
  C) for s in 1111 5; do run greedy "$s" --greedy_decoder; done ;;
  D) for s in 1111 5; do run bidir "$s" --bidirectional_decoder; done ;;
  E) for s in 5 7; do run lsort "$s" --matmul_precision default \
       --length_sorted_batches; done ;;
esac; done
echo "sweep done"

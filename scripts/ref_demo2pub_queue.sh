#!/bin/bash
# Round-5 reference-side leg of the demo2-publication regime hunt
# (VERDICT r4 item 1).  The ours-side sweep (demo2pub_sweep.sh) located a
# robust tilted-uniform regime at the FULL publication config on the
# demo2 chirp/noise corpus: posterior perplexity stays near-uniform
# (~127.7 of 128) yet the argmax assignment recovers the ground-truth
# classes at ARI 0.70-0.81 for seeds 3/5/7, stable across matmul
# precision, greedy/bidirectional decoding, and batch composition.
# This script runs the REFERENCE at the identical corpus + config so
# PARITY.md can compare frameworks in that regime, not just at the
# uniform fixed point.
#
# Serial on the single CPU core (CLAUDE.md: concurrent heavy jobs poison
# each other).  Waits for an optional predecessor PID (the in-flight
# dose-1 toyaug reference seed) before starting.  Each run is resumable
# via --work_dir + pubscale_state.sh stash.
# Usage: ref_demo2pub_queue.sh [wait_pid] [seed ...]   (default seeds: 5 7 3)
set -u
cd "$(dirname "$0")/.."

wait_pid="${1:-}"
if [ -n "$wait_pid" ] && kill -0 "$wait_pid" 2>/dev/null; then
  echo "waiting for PID $wait_pid to exit..."
  while kill -0 "$wait_pid" 2>/dev/null; do sleep 60; done
  echo "PID $wait_pid exited at $(date)"
fi
shift || true
seeds=("$@"); [ ${#seeds[@]} -eq 0 ] && seeds=(5 7 3)

for s in "${seeds[@]}"; do
  out="parity_runs/ref_demo2pub_s${s}.json"
  [ -f "$out" ] && { echo "skip $out"; continue; }
  wd="/tmp/parity_demo2pub_s${s}"
  # restore a cross-round stash if one exists and the work dir is fresh
  if [ ! -d "$wd" ] && [ -d "parity_runs/workdirs/demo2pub_s${s}" ]; then
    bash scripts/pubscale_state.sh restore "demo2pub_s${s}" "$wd" || true
  fi
  echo "=== ref demo2pub seed $s -> $out ($(date))"
  timeout 14400 python scripts/parity_run.py \
    --corpus demo2 --segments 800 --batch_size 512 --hidden 256 \
    -K 128 --feature_dim 256 --epochs 20 --pretrain_epochs 5 \
    --speaker_embed_dim 256 --corpus_seed 0 --seed "$s" \
    --skip_ours --device cpu --work_dir "$wd" --out_name "$out" \
    > "/tmp/ref_demo2pub_s${s}.log" 2>&1 || echo "FAILED $out rc=$?"
  # stash the rolling checkpoint ONLY if the run did not complete (the
  # stash exists to resume across container restarts; a finished run's
  # checkpoint is 7 MB of dead weight in the repo)
  if [ ! -f "$out" ]; then
    bash scripts/pubscale_state.sh save "demo2pub_s${s}" "$wd" || true
  else
    rm -rf "parity_runs/workdirs/demo2pub_s${s}"
  fi
done
echo "ref demo2pub queue done ($(date))"

#!/bin/bash
# Round-5 addendum: pallas-STFT-frontend MFU rows (the configuration the
# 22.2 ms PROFILE_r03/r04 headline step uses; the main measurement batch
# ran the fft frontend, which the LSTM row prices at ~+2 ms device).
# Chained after r5_tpu_queue2.sh so TPU jobs never overlap.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5prof

run_prof() {
  local tag="$1"; shift
  [ -f "/tmp/r5prof/$tag.json" ] && { echo "skip $tag"; return; }
  echo "=== profile $tag ($(date +%H:%M:%S))"
  timeout 5400 python scripts/profile_step.py --precision default \
    --device_audio --stft_method pallas \
    --trace "/tmp/r5prof/trace_$tag" \
    --out "/tmp/r5prof/$tag.json" "$@" \
    > "/tmp/r5prof/$tag.log" 2>&1 || { echo "FAILED $tag rc=$?"; return; }
  timeout 1200 python scripts/trace_report.py "/tmp/r5prof/trace_$tag" \
    --top 5 > "/tmp/r5prof/trace_$tag.txt" 2>&1 \
    || echo "trace_report FAILED for $tag"
}

for cell in LSTM GRU RNN ESN; do
  run_prof "mfups_$cell" --rnn_type "$cell"
done
echo "r5 addendum done ($(date))"

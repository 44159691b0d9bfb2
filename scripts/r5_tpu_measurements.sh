#!/bin/bash
# Round-5 TPU evidence batch (VERDICT r4 items 5 and 9), serialized so
# runs never contend with each other on the device:
#   1. PROFILE_r05 MFU rows: publication-shape fused step for all four
#      cells with XLA + scan-lowering FLOP counts AND a 3-step device
#      trace each (wall step times are RTT-inflated on this tunnel —
#      0.11 MB/s upload measured this session — so MFU is computed from
#      the trace's device step time, the only trustworthy attribution).
#   2. Bidirectional-decoder cost: B/A/B (bidir, uni, bidir) at
#      publication shape, scan path — prices the mode before parity
#      sweeps adopt it (reference model.py:198-260).
#   3. computed_floor.py hardware microprobes -> per-kernel floors.
# Audio is staged int16 and widened on device (--i16_audio): the f32
# upload alone cost 589 s in the first attempted run of this batch.
# NOTE: runs while the single CPU core is occupied by the reference
# parity leg; host contention inflates compile walls, not device times.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5prof

run_prof() { # run_prof <tag> [args...]
  local tag="$1"; shift
  [ -f "/tmp/r5prof/$tag.json" ] && { echo "skip $tag"; return; }
  echo "=== profile $tag ($(date +%H:%M:%S))"
  timeout 5400 python scripts/profile_step.py --precision default \
    --device_audio --trace "/tmp/r5prof/trace_$tag" \
    --out "/tmp/r5prof/$tag.json" "$@" \
    > "/tmp/r5prof/$tag.log" 2>&1 || { echo "FAILED $tag rc=$?"; return; }
  timeout 1200 python scripts/trace_report.py "/tmp/r5prof/trace_$tag" \
    --top 5 > "/tmp/r5prof/trace_$tag.txt" 2>&1 \
    || echo "trace_report FAILED for $tag"
}

for cell in LSTM GRU RNN ESN; do
  run_prof "mfu_$cell" --rnn_type "$cell"
done

run_prof bidir1 --bidir_decoder --skip_flops
run_prof uni1   --skip_flops
run_prof bidir2 --bidir_decoder --skip_flops

if [ ! -f PROFILE_r05_floor.json ]; then
  echo "=== computed_floor ($(date +%H:%M:%S))"
  timeout 3600 python scripts/computed_floor.py \
    --out PROFILE_r05_floor.json > /tmp/r5prof/floor.log 2>&1 \
    || echo "FAILED floor rc=$?"
fi
echo "r5 tpu measurements done ($(date))"

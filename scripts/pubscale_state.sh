#!/bin/bash
# Stash / restore the resumable state of a publication-scale reference
# run (scripts/parity_run.py --work_dir) across container restarts.
#
# /tmp is wiped between rounds, but the repo persists via git — so a
# ~2.5 h CPU reference seed that can't finish in one session rolls its
# per-epoch checkpoint into parity_runs/workdirs/ at session end and is
# restored into a fresh /tmp work dir next session.  The reference
# Learner auto-resumes when BOTH ref-run/history.log (retrieval trigger,
# /root/reference/ABCD-VAE/learning.py:17-18) and ref-run/checkpoint.pt
# (learning.py:317-330) are present; the corpus wavs are regenerated
# deterministically from --corpus_seed and are NOT stashed.
#
# Usage:
#   scripts/pubscale_state.sh save    <name> <work_dir>   # /tmp -> repo
#   scripts/pubscale_state.sh restore <name> <work_dir>   # repo -> /tmp
# e.g.
#   scripts/pubscale_state.sh save pub1_s1111 /tmp/parity_pub1_s1111
set -eu
cd "$(dirname "$0")/.."
mode="$1"; name="$2"; work="$3"
stash="parity_runs/workdirs/$name/ref-run"

# Drop any aborted in-flight epoch from a history.log: keep everything
# up to and including the last "END OF EPOCH" line.  The checkpoint is
# written at epoch boundaries, so trailing partial-epoch lines describe
# work the resume will redo — and parity_run.py's history parser would
# otherwise record them as duplicate curve points (curve index would
# drift off the epoch axis).
truncate_after_last_epoch() {
  local f="$1"
  local last
  last=$(grep -n "END OF EPOCH" "$f" | tail -1 | cut -d: -f1)
  [ -n "$last" ] || { echo "no END OF EPOCH line in $f"; exit 1; }
  head -n "$last" "$f" > "$f.tmp" && mv "$f.tmp" "$f"
}

case "$mode" in
  save)
    # Verify BOTH files exist before copying either — a partial stash
    # (checkpoint without history.log, the Learner's retrieval trigger)
    # would silently restart from epoch 1 and overwrite the checkpoint.
    [ -f "$work/ref-run/checkpoint.pt" ] || {
      echo "no checkpoint at $work/ref-run/checkpoint.pt"; exit 1; }
    [ -f "$work/ref-run/history.log" ] || {
      echo "no history.log at $work/ref-run/history.log"; exit 1; }
    mkdir -p "$stash"
    cp "$work/ref-run/checkpoint.pt" "$stash/checkpoint.pt"
    cp "$work/ref-run/history.log" "$stash/history.log"
    truncate_after_last_epoch "$stash/history.log"
    echo "stashed $(du -h "$stash/checkpoint.pt" | cut -f1) checkpoint;" \
         "last epoch line:"
    grep -E "END OF EPOCH" "$stash/history.log" | tail -1 || true
    ;;
  restore)
    [ -f "$stash/checkpoint.pt" ] || {
      echo "nothing stashed at $stash"; exit 1; }
    [ -f "$stash/history.log" ] || {
      echo "stash is partial: no history.log at $stash"; exit 1; }
    mkdir -p "$work/ref-run"
    # history.log first: if the copy is interrupted after the first
    # file, checkpoint-without-history would restart from scratch,
    # while history-without-checkpoint just fails loudly at load.
    cp "$stash/history.log" "$work/ref-run/history.log"
    truncate_after_last_epoch "$work/ref-run/history.log"
    cp "$stash/checkpoint.pt" "$work/ref-run/checkpoint.pt"
    echo "restored into $work/ref-run; re-run the same parity_run.py" \
         "command with --work_dir $work to continue."
    ;;
  *) echo "usage: $0 save|restore <name> <work_dir>"; exit 2 ;;
esac

"""Device-time breakdown from a jax.profiler trace (.xplane.pb).

The tunneled TPU's per-call wall timings conflate dispatch/transfer with
compute, so wall-clock ablations cannot decompose a train step
(BASELINE.md).  The profiler's device plane records each XLA op's
on-device duration from the device's own clock — immune to host
contention — which makes it the only trustworthy step breakdown in this
container.

Usage: python scripts/trace_report.py TRACE_DIR [--top 30] [--steps N]
  TRACE_DIR: directory passed to jax.profiler.trace / --profile_dir
             (searched recursively for *.xplane.pb)
Prints total device time and the top ops grouped by fusion/op name,
plus a coarse phase grouping (frontend/encoder/decoder/backward/other)
keyed on HLO op-name substrings.
"""

import argparse
import collections
import glob
import gzip
import os
import sys


def load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        data = f.read()
    if path.endswith(".gz"):
        data = gzip.decompress(data)
    xspace.ParseFromString(data)
    return xspace


def device_events(xspace):
    """Yield (name, metadata_name, duration_ps, line_name) for every event
    on TPU/device planes (skip host threads)."""
    for plane in xspace.planes:
        pname = plane.name.lower()
        if not ("tpu" in pname or "device" in pname or "/device:" in pname):
            continue
        if "host" in pname:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        stats_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                stats = {}
                for st in ev.stats:
                    sname = stats_meta.get(st.metadata_id, "")
                    if st.str_value:
                        stats[sname] = st.str_value
                yield (name, ev.duration_ps, line.name, stats)


PHASES = (
    ("frontend", ("stft", "rfft", "fft", "spectro", "window", "frame")),
    ("encoder", ("encoder", "lstm_layer", "fwd2", "bidir")),
    ("decoder", ("decoder", "gru_loop", "decoder_loop")),
    ("backward", ("transpose", "grad", "bwd", "vjp")),
    ("optimizer", ("clip", "sgd", "optim", "add_any")),
)


def classify(name: str) -> str:
    low = name.lower()
    for phase, keys in PHASES:
        if any(k in low for k in keys):
            return phase
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    paths = sorted(glob.glob(os.path.join(
        args.trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        sys.exit(f"no .xplane.pb under {args.trace_dir}")
    path = paths[-1]
    print(f"# {path}")
    xspace = load_xspace(path)

    by_op = collections.Counter()
    by_line = collections.Counter()
    for name, dur_ps, line_name, stats in device_events(xspace):
        by_op[name] += dur_ps
        by_line[line_name] += dur_ps

    # XLA Ops line carries the exclusive per-op times; "XLA Modules" lines
    # carry whole-program spans (would double count) — report both
    # separately.
    print("\n## device lines (total ps by line)")
    for line_name, ps in by_line.most_common():
        print(f"{ps / 1e9:10.3f} ms  {line_name}")

    total = sum(by_op.values())
    print(f"\n## top ops (all device lines, {total / 1e9:.3f} ms total)")
    phase_tot = collections.Counter()
    for name, ps in by_op.most_common():
        phase_tot[classify(name)] += ps
    for name, ps in by_op.most_common(args.top):
        print(f"{ps / 1e9:10.3f} ms  {100 * ps / total:5.1f}%  {name[:100]}")

    print("\n## coarse phases (op-name heuristic)")
    for phase, ps in phase_tot.most_common():
        print(f"{ps / 1e9:10.3f} ms  {100 * ps / total:5.1f}%  {phase}")


if __name__ == "__main__":
    main()

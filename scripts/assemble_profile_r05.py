"""Assemble PROFILE_r05.json from the round-5 TPU evidence batch.

Inputs (produced by scripts/r5_tpu_measurements.sh into /tmp/r5prof):
  mfu_{LSTM,GRU,RNN,ESN}.json   profile_step rows (wall step, flop rows)
  trace_mfu_*.txt               trace_report output (device step times)
  bidir1/uni1/bidir2.json + trace_*.txt   bidirectional-decoder B/A/B
  PROFILE_r05_floor.json        computed_floor microprobe output (repo root)

Why assembly is needed at all:
- Wall step times on this tunnel are RTT-inflated (utils/sync.wait
  closes with a host fetch; the tunnel added ~10 ms/step the day this
  was built) — the device trace's per-step time is the honest latency.
- XLA's cost analysis cannot count the model's FLOPs here: the fused
  Pallas kernels are custom-calls it can't see into, and a lax.scan
  body is counted once, not trip-count times.  So MFU is computed from
  the ANALYTIC op-count model in scripts/computed_floor.py (recurrent
  kernels only — a strict lower bound on real FLOPs; STFT, the ABCD
  head, and the optimizer are excluded and listed separately).

Usage: python scripts/assemble_profile_r05.py [--dir /tmp/r5prof]
       [--out PROFILE_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from computed_floor import kernel_models  # noqa: E402


def device_step_ms(trace_txt: str, n_steps: int = 3) -> float | None:
    """Per-step device ms from a trace_report dump ("XLA Modules" line =
    whole-program device span, n_steps programs per trace)."""
    if not os.path.exists(trace_txt):
        return None
    for line in open(trace_txt):
        m = re.match(r"\s*([0-9.]+) ms\s+XLA Modules", line)
        if m:
            return float(m.group(1)) / n_steps
    return None


def analytic_flops(cell: str, B: int, H: int, F: int, M: int,
                   T: int) -> float:
    models = kernel_models(B, H, F, M, cell)
    return float(T * sum(m["mxu"] for m in models.values()))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/r5prof")
    ap.add_argument("--out", default="PROFILE_r05.json")
    ap.add_argument("--peak", type=float, default=197e12)
    args = ap.parse_args()
    d = args.dir

    def load(tag):
        p = os.path.join(d, f"{tag}.json")
        return json.load(open(p)) if os.path.exists(p) else None

    out = {
        "note": ("device_step_ms from jax.profiler traces (wall rows are "
                 "tunnel-RTT-inflated); mfu_analytic uses the "
                 "computed_floor op-count model over the four recurrent "
                 "kernels — a lower bound (STFT/ABCD head/optimizer "
                 "excluded).  'cells' rows use the pallas STFT frontend "
                 "(the r03/r04 headline-step configuration) when the "
                 "mfups_* addendum ran; 'cells_fft_frontend' rows are "
                 "the parity-default fft frontend."),
        "cells": {}, "cells_fft_frontend": {}, "bidir_ab": {},
    }
    for cell in ("LSTM", "GRU", "RNN", "ESN"):
        for tag_prefix, dest in (("mfups_", "cells"),
                                 ("mfu_", "cells_fft_frontend")):
            _assemble_cell(load, d, args, out[dest], cell,
                           tag_prefix + cell)
    # no addendum ran: promote the fft rows to the headline slot
    if not out["cells"]:
        out["cells"] = out.pop("cells_fft_frontend")
        out["cells_fft_frontend"] = {}

    ab = {}
    for tag in ("bidir1", "uni1", "bidir2"):
        row = load(tag)
        if not row:
            continue
        ab[tag] = {
            "bidir_decoder": row.get("bidir_decoder"),
            "wall_step_ms": row["train_step_ms"],
            "device_step_ms": device_step_ms(
                os.path.join(d, f"trace_{tag}.txt")),
            "backend": row.get("rnn_backend"),
        }
    out["bidir_ab"] = ab

    floor_p = os.path.join(REPO, "PROFILE_r05_floor.json")
    if os.path.exists(floor_p):
        out["computed_floor"] = json.load(open(floor_p))

    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


def _assemble_cell(load, d, args, dest, cell, tag):
    row = load(tag)
    if not row:
        return
    dev_ms = device_step_ms(os.path.join(d, f"trace_{tag}.txt"))
    fl = analytic_flops(cell, row["batch"], 256, 65, 256,
                        row["bucket"])
    # On the pallas backend the XLA-counted FLOPs are exactly the
    # NON-recurrent work (frontend, ABCD head, losses outside the
    # kernels, optimizer): every recurrent kernel is an opaque
    # custom-call.  Total model FLOPs = analytic recurrent
    # (computed_floor op counts) + XLA-visible remainder.
    xla_fl = row.get("flops_per_step") or 0.0
    total_fl = fl + xla_fl
    entry = {
        "wall_step_ms": row["train_step_ms"],
        "device_step_ms": dev_ms,
        "stft_method": row.get(
            "stft_method",
            "pallas" if tag.startswith("mfups") else "fft"),
        "analytic_recurrent_gflops": round(fl / 1e9, 2),
        "xla_visible_gflops": round(xla_fl / 1e9, 2),
        "total_model_gflops": round(total_fl / 1e9, 2),
        "backend": row.get("rnn_backend"),
    }
    if dev_ms:
        entry["mfu_analytic"] = round(total_fl / (dev_ms * 1e-3)
                                      / args.peak, 5)
        entry["segments_per_sec_device"] = round(
            row["batch"] / (dev_ms * 1e-3), 1)
    dest[cell] = entry


if __name__ == "__main__":
    main()

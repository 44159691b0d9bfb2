"""Same-session stream-vs-fused A/B for the decoder in-kernel-loss path.

For each cell type, runs scripts/profile_step.py three times in B/A/B
order — stream kernels, fused-losses kernel, stream re-run — in the
SAME tunnel session, so drift shows up as a stream-vs-stream2 gap and
the fused delta is attributable.  The stream/fused toggle:

- LSTM: ``SEQ2SEQ_NLL_FUSION=0`` (stream) vs default (fused)
- GRU/RNN: ``SEQ2SEQ_FUSED_CELLS=""`` (stream) vs default (fused) —
  models/decoder.py:_fused_loss_cells; fused has been the default for
  all three cells since the r4 evidence landed

Each leg is a separate process (the gate is read at trace time, so one
process cannot re-trace both variants through the jit cache); the
persistent XLA compile cache makes repeat legs cheap.  Results land in
one JSON (default PROFILE_ab.json) keyed ``<cell>.<leg>``.

Usage: python scripts/fused_loss_ab.py [--cells GRU RNN] [--batch 512]
       [--bucket 512] [--out PROFILE_ab.json]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def run_leg(cell: str, leg: str, batch: int, bucket: int,
            precision: str, extra_env: dict | None = None) -> dict:
    env = dict(os.environ)
    env.pop("SEQ2SEQ_FUSED_CELLS", None)
    env.pop("SEQ2SEQ_NLL_FUSION", None)
    env.pop("SEQ2SEQ_STREAM_DTYPE", None)
    env.pop("SEQ2SEQ_ESN_KERNELS", None)
    if leg == "fused":
        pass  # fused is the default for all three cells
    else:  # stream
        if cell == "LSTM":
            env["SEQ2SEQ_NLL_FUSION"] = "0"
        else:
            env["SEQ2SEQ_FUSED_CELLS"] = ""
    env.update(extra_env or {})
    out = tempfile.mktemp(suffix=".json")
    cmd = [sys.executable, os.path.join(REPO, "scripts", "profile_step.py"),
           "--batch", str(batch), "--bucket", str(bucket),
           "--precision", precision, "--stft_method", "pallas",
           "--rnn_type", cell, "--skip_flops", "--out", out]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"{cell}/{leg} failed:\n{r.stdout[-2000:]}\n"
                           f"{r.stderr[-2000:]}")
    rep = json.load(open(out))
    os.unlink(out)
    return {"train_step_ms": rep["train_step_ms"],
            "segments_per_sec": rep["segments_per_sec"],
            "compile_s": rep["compile_s"],
            "rnn_backend": rep.get("rnn_backend")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", nargs="+", default=["GRU", "RNN"])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--bucket", type=int, default=512)
    ap.add_argument("--precision", type=str, default="default")
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "PROFILE_ab.json"))
    ap.add_argument("--ab", choices=["fusion", "stream_dtype", "esn_gate"],
                    default="fusion",
                    help="fusion: stream vs fused-loss kernels. "
                         "stream_dtype: f32 vs bf16 saved carry streams "
                         "(SEQ2SEQ_STREAM_DTYPE) on the fused path — "
                         "B/A/B legs sd_f32 / sd_bf16 / sd_f32b. "
                         "esn_gate: SEQ2SEQ_ESN_KERNELS=0 scan vs the "
                         "kernel dispatch (use with --cells ESN) — the "
                         "perf basis for the ESN kernel default")
    args = ap.parse_args()

    results = {}
    if os.path.isfile(args.out):
        results = json.load(open(args.out))
    legs = (("stream", "stream", {}), ("fused", "fused", {}),
            ("stream2", "stream", {}))
    if args.ab == "stream_dtype":
        legs = (("sd_f32", "fused", {"SEQ2SEQ_STREAM_DTYPE": "f32"}),
                ("sd_bf16", "fused", {"SEQ2SEQ_STREAM_DTYPE": "bf16"}),
                ("sd_f32b", "fused", {"SEQ2SEQ_STREAM_DTYPE": "f32"}))
    elif args.ab == "esn_gate":
        legs = (("scan", "fused", {"SEQ2SEQ_ESN_KERNELS": "0"}),
                ("kernel", "fused", {}),
                ("scan2", "fused", {"SEQ2SEQ_ESN_KERNELS": "0"}))
    for cell in args.cells:
        for leg, real_leg, extra in legs:
            r = run_leg(cell, real_leg, args.batch, args.bucket,
                        args.precision, extra)
            results[f"{cell}.{leg}"] = r
            print(json.dumps({"cell": cell, "leg": leg, **r}), flush=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)
        ka, kb, ka2 = (l[0] for l in legs)
        a, b, a2 = (results[f"{cell}.{k}"]["train_step_ms"]
                    for k in (ka, kb, ka2))
        print(json.dumps({"cell": cell, f"{ka}_ms": a, f"{kb}_ms": b,
                          f"{ka2}_ms": a2,
                          "delta_ms": round(b - (a + a2) / 2, 3)}),
              flush=True)


if __name__ == "__main__":
    main()

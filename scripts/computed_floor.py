"""Computed per-kernel step-time floors for the fused train step.

Round-4 closed the decoder-backward lever table with four hardware
refutations (split-pass, grid-unroll, batch-ILP, bf16 streams — see
BASELINE.md) and concluded the old ≈13.3 ms aggregate "bf16-MXU
roofline" *undercounts* real per-step work — but left the revised floor
asserted, not computed.  This script computes it (round-4 VERDICT
item 5):

  floor(kernel) = grid_steps x ( c_fixed
                                 + max(t_MXU, t_VPU-trans, t_HBM) )

where the three per-step terms are analytic op counts at the given
shape (B, T, H, F, M) priced against

  - the chip's published bf16 MXU peak, derated by a MEASURED
    small-dot efficiency (a (B,H)x(H,4H) dot chain cannot fill the
    systolic array the way a square matmul does),
  - a MEASURED per-element transcendental cost (tanh/sigmoid/exp on
    the VPU — the decoder runs ~1M transcendental elements per step,
    entirely ignored by the old MXU-only floor),
  - HBM stream bytes at the chip's published bandwidth,

and c_fixed is the MEASURED fixed cost of one Pallas grid step (carry
dependency, no work).  The three constants come from microprobe kernels
run on the actual hardware, timed by differencing two grid depths so
dispatch/tunnel costs cancel:

  t_per_step = (wall(T=T2) - wall(T=T1)) / (T2 - T1)

Op-count model (per grid step, publication shape defaults B=512 H=256
F=65 M=256):

  decoder fwd   cell dots 2B(F+H)G_c + emission MLPs 2x2B(HM+MF)
                + offset MLP 2B(HM+M); trans: gates g_c BH + 3BM MLP
                tanh + ~2BF NLL exp/log  [G_c = 4H LSTM / 3H GRU / H
                Elman-ESN; g_c = 5 / 3 / 1]
  decoder bwd   2x fwd dots (dx and dW per fwd matmul) + gate
                recompute trans + derivative polys (counted as +50%
                trans)
  encoder bidir fwd: 2 directions x cell dots; bwd: 2x its dots.
  HBM streams   decoder fwd: noise (B,F) in + targets (B,F) in + saved
                carries (B,H)x(1+carries_c) out; bwd: saved carries
                re-read + d-streams.  encoder: x (B,F) in (+ saved h
                out fwd; re-read bwd).

Compare against measured device-trace times (PROFILE_r04 /
trace_report.py) passed via --measured 'name=ms,...' or the built-in
r04 LSTM row.  Output: PROFILE-style JSON + a table with
floor_fraction = floor / measured.

Reference anchor: the sequential decoder loop this models is
ABCD-VAE/modules/model.py:165-196; the encoder layer model.py:60-66.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


# ----------------------------------------------------------------- probes
def _timed_chain(fn, args, n: int):
    """Wall of n back-to-back dispatches closed by ONE host fetch.

    The tunnel acks dispatches without executing them and the closing
    fetch pays an RTT that drifts tens of ms within a session (108 ms
    measured the night this was rewritten).  A single-call depth
    difference has an ms-scale signal and was measured as ~zero twice
    (c_trans 1e-18 s/elem, probe_dot 2.6e-12 s/step — both physically
    impossible).  Chaining n calls multiplies the device-work signal by
    n while the RTT is still paid once; the device executes queued
    programs serially, so the chain length is real device time."""
    from seq2seq_abcd_vae_tpu.utils.sync import wait
    out = fn(*args)
    wait(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    wait(out)
    return time.perf_counter() - t0


def _per_step(build, t1: int, t2: int, reps: int = 5,
              chain: int = 16, telemetry: dict | None = None,
              name: str = "") -> float:
    """Per-grid-step seconds by chained depth differencing."""
    import jax
    f1, a1 = build(t1)
    f2, a2 = build(t2)
    f1 = jax.jit(f1)
    f2 = jax.jit(f2)
    d1 = min(_timed_chain(f1, a1, chain) for _ in range(reps))
    d2 = min(_timed_chain(f2, a2, chain) for _ in range(reps))
    if telemetry is not None:
        telemetry[name] = {
            "chain": chain, "t1": t1, "t2": t2,
            "wall_t1_s": round(d1, 4), "wall_t2_s": round(d2, 4),
            "signal_s": round(d2 - d1, 4)}
    return max(d2 - d1, 1e-9) / (chain * (t2 - t1))


def probe_constants(B: int, H: int, reps: int = 3) -> dict:
    """Measure c_fixed, c_trans (s/element), and small-dot MXU
    efficiency on the attached TPU."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = 4 * H

    def fixed_kernel(o_ref):
        o_ref[...] += 1.0

    def build_fixed(T):
        def call():
            return pl.pallas_call(
                fixed_kernel,
                grid=(T,),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0)),
            )()
        return call, ()

    def trans_kernel(x_ref, o_ref):
        # serial dependency through o_ref so steps cannot fuse/elide;
        # 2 transcendentals per element of (B, G).  The accumulator is
        # a FULL-block reduction: the first version of this probe kept
        # only an (8, 128) slice and Mosaic dead-code-eliminated the
        # rest of the tanh/sigmoid work (measured c_trans ~1e-18
        # s/elem, a physical impossibility); a sum() consumes every
        # element so nothing can be elided.
        v = jnp.tanh(x_ref[...] + o_ref[0, 0])
        v = jax.nn.sigmoid(v)
        o_ref[...] += v.sum()

    def build_trans(T):
        x = jnp.full((B, G), 0.01, jnp.float32)

        def call(x):
            return pl.pallas_call(
                trans_kernel,
                grid=(T,),
                in_specs=[pl.BlockSpec((B, G), lambda t: (0, 0))],
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0)),
            )(x)
        return call, (x,)

    def mxu_kernel(w_ref, o_ref):
        # consume EVERY output column of the dot (sum of the G/H
        # H-wide chunks): keeping only g[:, :H] let the compiler
        # narrow the contraction to a quarter of the counted FLOPs,
        # which biased mxu_smalldot_eff low by the same factor
        g = jnp.dot(o_ref[...], w_ref[...],
                    preferred_element_type=jnp.float32)
        acc = g[:, :H]
        for c in range(1, G // H):
            acc = acc + g[:, c * H:(c + 1) * H]
        o_ref[...] += 1e-4 * acc

    def build_mxu(T):
        w = jnp.full((H, G), 1e-3, jnp.float32)

        def call(w):
            return pl.pallas_call(
                mxu_kernel,
                grid=(T,),
                in_specs=[pl.BlockSpec((H, G), lambda t: (0, 0))],
                out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
                out_specs=pl.BlockSpec((B, H), lambda t: (0, 0)),
            )(w)
        return call, (w,)

    # Depth pairs sized so the chained signal is >= tens of ms against
    # the tunnel's ~10-100 ms RTT jitter (see _timed_chain).
    tel: dict = {}
    c_fixed = _per_step(build_fixed, 1024, 16384, reps, chain=32,
                        telemetry=tel, name="fixed")
    t_trans = _per_step(build_trans, 128, 2048, reps, chain=8,
                        telemetry=tel, name="trans")
    t_mxu = _per_step(build_mxu, 128, 2048, reps, chain=16,
                      telemetry=tel, name="mxu")

    kind = jax.devices()[0].device_kind.lower()
    peaks = {"v4": 275e12, "v5 lite": 197e12, "v5e": 197e12,
             "v5p": 459e12, "v6": 918e12}
    peak = next((v for k, v in peaks.items() if k in kind), 197e12)
    dot_flops = 2.0 * B * H * G
    mxu_eff = dot_flops / peak / max(t_mxu - c_fixed, 1e-12)
    c_trans = max(t_trans - c_fixed, 1e-12) / (2.0 * B * G)
    low_conf = [k for k, v in tel.items() if v["signal_s"] < 0.02]
    return {"c_fixed_s": c_fixed, "c_trans_s_per_elem": c_trans,
            "mxu_smalldot_eff": min(mxu_eff, 1.0), "peak_bf16": peak,
            "probe_dot_per_step_s": t_mxu, "device_kind": kind,
            "probe_telemetry": tel,
            "low_confidence_probes": low_conf}


# ------------------------------------------------------------- op counts
CELL_GATES = {"LSTM": 4, "GRU": 3, "RNN": 1, "ESN": 1}
CELL_TRANS = {"LSTM": 5, "GRU": 4, "RNN": 1, "ESN": 1}  # xBH per step
CELL_CARRIES = {"LSTM": 2, "GRU": 1, "RNN": 1, "ESN": 1}


def kernel_models(B, H, F, M, cell):
    """Per-grid-step (mxu_flops, trans_elems, hbm_bytes) per kernel."""
    Gc = CELL_GATES[cell] * H
    cell_dots = 2.0 * B * (F + H) * Gc
    emis = 2 * (2.0 * B * (H * M + M * F))
    offs = 2.0 * B * (H * M + M * 1)
    gates_tr = CELL_TRANS[cell] * B * H
    mlp_tr = 3.0 * B * M
    nll_tr = 2.0 * B * F
    carries = CELL_CARRIES[cell]
    f32 = 4
    dec_fwd = {
        "mxu": cell_dots + emis + offs,
        "trans": gates_tr + mlp_tr + nll_tr,
        # noise + targets in; saved h trajectory (+c for LSTM) out
        "hbm": (2 * B * F + (1 + carries) * B * H) * f32,
    }
    dec_bwd = {
        "mxu": 2.0 * dec_fwd["mxu"],
        "trans": 1.5 * dec_fwd["trans"],
        # saved carries re-read + dnoise-free (loss scalars): streams
        # re-read + x/dx equivalents
        "hbm": (2 * B * F + 2 * (1 + carries) * B * H) * f32,
    }
    enc_cell = 2.0 * B * (F + H) * Gc
    enc_fwd = {
        "mxu": 2 * enc_cell,                      # two directions
        "trans": 2 * gates_tr,
        "hbm": (2 * B * F + 2 * carries * B * H) * f32,
    }
    enc_bwd = {
        "mxu": 2 * enc_fwd["mxu"],
        "trans": 1.5 * enc_fwd["trans"],
        "hbm": (2 * B * F + 4 * carries * B * H) * f32,
    }
    return {"decoder_fwd": dec_fwd, "decoder_bwd": dec_bwd,
            "encoder_bidir_fwd": enc_fwd, "encoder_bidir_bwd": enc_bwd}


# r04 measured device-trace times (ms) at B=512 T=512 LSTM fused-losses
R04_MEASURED = {"decoder_fwd": 2.59, "decoder_bwd": 7.50,
                "encoder_bidir_fwd": 2.83, "encoder_bidir_bwd": 6.35}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--bucket", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--input_size", type=int, default=65)
    ap.add_argument("--mlp", type=int, default=256)
    ap.add_argument("--cells", default="LSTM,GRU,RNN,ESN")
    ap.add_argument("--measured", default=None,
                    help="name=ms,... device-trace times to compare "
                         "(default: built-in r04 LSTM row)")
    ap.add_argument("--out", default="PROFILE_r05_floor.json")
    ap.add_argument("--skip_probes", action="store_true",
                    help="use r04-session constants instead of running "
                         "the hardware microprobes")
    args = ap.parse_args()

    if args.skip_probes:
        consts = {"c_fixed_s": 1.0e-6, "c_trans_s_per_elem": 2.0e-9,
                  "mxu_smalldot_eff": 0.5, "peak_bf16": 197e12,
                  "note": "placeholder constants (--skip_probes)"}
    else:
        import jax
        jax.config.update("jax_platforms", "axon,cpu")
        from seq2seq_abcd_vae_tpu.utils import (
            enable_persistent_compilation_cache)
        enable_persistent_compilation_cache()
        consts = probe_constants(args.batch, args.hidden)

    hbm_bw = 819e9  # v5e published HBM bandwidth
    peak = consts["peak_bf16"] * consts["mxu_smalldot_eff"]
    T = args.bucket
    measured = dict(R04_MEASURED)
    if args.measured:
        measured = {k: float(v) for k, v in
                    (kv.split("=") for kv in args.measured.split(","))}

    out = {"constants": consts, "shape": vars(args), "kernels": {}}
    for cell in args.cells.split(","):
        models = kernel_models(args.batch, args.hidden, args.input_size,
                               args.mlp, cell)
        rows = {}
        for name, m in models.items():
            t_mxu = m["mxu"] / peak
            t_tr = m["trans"] * consts["c_trans_s_per_elem"]
            t_hbm = m["hbm"] / hbm_bw
            step = consts["c_fixed_s"] + max(t_mxu, t_tr, t_hbm)
            floor_ms = T * step * 1e3
            row = {"floor_ms": round(floor_ms, 3),
                   "t_mxu_us": round(t_mxu * 1e6, 3),
                   "t_trans_us": round(t_tr * 1e6, 3),
                   "t_hbm_us": round(t_hbm * 1e6, 3),
                   "binding": max(("mxu", t_mxu), ("trans", t_tr),
                                  ("hbm", t_hbm), key=lambda p: p[1])[0]}
            if cell == "LSTM" and name in measured:
                row["measured_ms"] = measured[name]
                row["floor_fraction"] = round(floor_ms / measured[name], 3)
            rows[name] = row
        out["kernels"][cell] = rows

    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

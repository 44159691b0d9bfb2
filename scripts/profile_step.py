"""Micro-profiler for the jitted train step on the local accelerator.

Times compile and steady-state step latency per (batch, bucket) shape,
computes MFU from the compiled program's own FLOP count
(XLA cost_analysis), and a few ablations (eval step, frontend, encoder,
decoder), to guide kernel work without running the full bench.

Usage: python scripts/profile_step.py [--batch 512] [--bucket 512]
       [--precision default] [--ablate] [--out PROFILE.json]
"""

import argparse
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)

import numpy as np
import jax

# sitecustomize pins jax_platforms=axon,cpu programmatically; honor an
# explicit JAX_PLATFORMS env var (e.g. =cpu for host-side testing)
_env_platforms = os.environ.get("JAX_PLATFORMS", "").strip()
if _env_platforms and _env_platforms != jax.config.jax_platforms:
    jax.config.update("jax_platforms", _env_platforms)


def timeit(fn, *args, n=5, **kw):
    # utils/sync.wait, NOT block_until_ready: the axon tunnel acks
    # dispatches without waiting for execution, so only a host fetch of
    # the last program's output is a real barrier.  Single-device PjRt
    # retires executions in dispatch order, so the n timed calls are
    # pipelined (the Learner's real regime) and the one fetch at the
    # end syncs them all.
    from seq2seq_abcd_vae_tpu.utils.sync import wait
    out = fn(*args, **kw)
    wait(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    wait(out)
    return (time.perf_counter() - t0) / n


# Peak dense matmul throughput per chip (bf16), FLOP/s.  Sources: public
# TPU spec sheets (v4 275T, v5e 197T, v5p 459T, v6e 918T bf16).
_PEAK_BF16 = {
    "v4": 275e12, "v5 lite": 197e12, "v5e": 197e12, "v5": 459e12,
    "v5p": 459e12, "v6 lite": 918e12, "v6e": 918e12,
}


def peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    for tag, peak in _PEAK_BF16.items():
        if tag in kind:
            return peak
    return None


def compiled_flops(jitted_call, *args, **kw) -> float | None:
    """FLOPs of the compiled executable, from XLA's own cost analysis."""
    try:
        compiled = jitted_call.lower(*args, **kw).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception as e:
        print(f"compiled_flops failed: {e!r}"[:300], file=sys.stderr)
        return None


def scan_backend_flops(jitted_call, statics, *args, **kw) -> float | None:
    """Model FLOPs/step counted on the scan backend.

    XLA's cost analysis cannot see inside Pallas custom-calls, so on the
    pallas backend ``compiled_flops`` under-counts by the whole
    recurrence (32 vs 132 GFLOP at B=512 T=112).  The scan lowering of
    the SAME step is fully visible to XLA; its count is the honest MFU
    numerator whichever backend is timed."""
    from seq2seq_abcd_vae_tpu.utils.backend_select import SELECTOR
    import dataclasses

    prev_env = os.environ.get("SEQ2SEQ_RNN_BACKEND")
    os.environ["SEQ2SEQ_RNN_BACKEND"] = "scan"
    SELECTOR.reset()
    try:
        st = dataclasses.replace(statics, rnn_backend="scan")
        return compiled_flops(jitted_call, *args, statics=st, **kw)
    finally:
        if prev_env is None:
            del os.environ["SEQ2SEQ_RNN_BACKEND"]
        else:
            os.environ["SEQ2SEQ_RNN_BACKEND"] = prev_env
        SELECTOR.reset()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--bucket", type=int, default=512)
    ap.add_argument("--precision", type=str, default="default")
    ap.add_argument("--stft_method", type=str, default="fft")
    ap.add_argument("--rnn_type", type=str, default="LSTM",
                    choices=["LSTM", "GRU", "RNN", "ESN"],
                    help="cell for BOTH encoder and decoder (the "
                         "reference's -R flag sets both)")
    ap.add_argument("--device_audio", action="store_true",
                    help="synthesize the timing audio on device "
                         "(jax.random.normal) — no host upload at all. "
                         "For step timing only: the transfer telemetry "
                         "rows are skipped.  The tunnel measured "
                         "0.03-0.11 MB/s this session, making ANY "
                         "staging of the 67 MB batch a 10-20 min cost")
    ap.add_argument("--i16_audio", action="store_true",
                    help="stage the timing audio as int16 and widen on "
                         "device (the Learner's real transfer format) — "
                         "skips the 67 MB f32 upload, which costs ~10 "
                         "minutes on a degraded tunnel day")
    ap.add_argument("--bidir_decoder", action="store_true",
                    help="profile with the bidirectional decoder "
                         "(reference --bidirectional_decoder, "
                         "model.py:198-260) — scan path, no fused "
                         "kernel; the A/B vs the default config prices "
                         "the mode before parity sweeps adopt it")
    ap.add_argument("--ablate", action="store_true")
    ap.add_argument("--skip_flops", action="store_true",
                    help="skip XLA cost analysis + the scan-lowering "
                         "FLOP count (each is an extra full compile at "
                         "this shape) — for lean A/B timing runs")
    ap.add_argument("--out", type=str, default=None,
                    help="also write the numbers to this JSON file")
    ap.add_argument("--trace", type=str, default=None,
                    help="write a jax.profiler trace of 3 steps here")
    args = ap.parse_args()

    jax.config.update("jax_default_matmul_precision", args.precision)

    from seq2seq_abcd_vae_tpu.configs import (ABCDSamplerConfig,
                                              DecoderConfig, EncoderConfig)
    from seq2seq_abcd_vae_tpu.models import encoder as enc_mod
    from seq2seq_abcd_vae_tpu.models import vae
    from seq2seq_abcd_vae_tpu.ops import stft as stft_ops
    from seq2seq_abcd_vae_tpu.train import optim
    from seq2seq_abcd_vae_tpu.train.learner import (StepStatics, _eval_step,
                                                    _train_step)

    enc = EncoderConfig(65, 256, rnn_type=args.rnn_type)
    lat = ABCDSamplerConfig(enc.hidden_size_total, 256, 128, 256)
    dec = DecoderConfig(65, 256, 256, 256, num_speakers=2,
                        speaker_embed_dim=256, rnn_type=args.rnn_type,
                        bidirectional=args.bidir_decoder)
    cfg = vae.ModelConfig(enc, lat, dec)
    params = vae.model_init(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(1.0, 0.0, 1.0)
    opt_state = tx.init(params)
    statics = StepStatics(cfg, 128, 64, "hann_window", 2.0 ** -15, 11.0,
                          args.stft_method)

    b, t = args.batch, args.bucket
    buf = (t - 1) * 64 + 128
    rng = np.random.default_rng(0)
    audio_host = (rng.normal(size=(b, buf)) * 1000).astype(np.float32)
    nf = np.full((b,), t, np.int32)
    spk = (np.arange(b) % 2).astype(np.int32)
    key = jax.random.PRNGKey(0)

    # Keep the timed inputs DEVICE-resident: with host numpy args every
    # call re-transfers the audio (67 MB f32 at B=512/T=512) over the
    # ~1.6 GB/s tunnel, conflating transfer with compute.  The Learner's
    # real loop pipelines int16 transfers (data/batching.py), so device
    # step time is the number the kernel work should be judged by; the
    # transfer cost is measured separately below.
    from seq2seq_abcd_vae_tpu.utils.sync import wait
    if args.device_audio:
        transfer_s = transfer_i16_s = float("nan")
        audio = wait(jax.jit(
            lambda k: jax.random.normal(k, audio_host.shape,
                                        np.float32) * 1000.0)(
            jax.random.PRNGKey(1)))
    else:
        audio_i16 = (audio_host * 0.01).astype(np.int16)
        t0 = time.perf_counter()
        dev_i16 = wait(jax.device_put(audio_i16))
        transfer_i16_s = time.perf_counter() - t0
        if args.i16_audio:
            transfer_s = float("nan")
            audio = wait(jax.jit(
                lambda a: a.astype(np.float32) * 100.0)(dev_i16))
        else:
            t0 = time.perf_counter()
            audio = wait(jax.device_put(audio_host))
            transfer_s = time.perf_counter() - t0
    print(f"host->device audio transfer: f32 {transfer_s * 1e3:8.2f}ms  "
          f"int16 {transfer_i16_s * 1e3:8.2f}ms  "
          f"({audio_host.nbytes / 1e6:.1f} MB f32)")
    nf, spk, key = jax.device_put((nf, spk, key))

    # _train_step donates params/opt_state; thread the returned state so
    # repeated timing calls never reuse a donated buffer
    state = {"p": params, "o": opt_state}

    def tr():
        p2, o2, m = _train_step(state["p"], state["o"], audio, nf, spk,
                                key, 512.0, 1.0, statics=statics,
                                no_sample=False, bucket_frames=t, tx=tx)
        state["p"], state["o"] = p2, o2
        return m

    # resolve the backend EAGERLY, outside any trace: the first resolution
    # otherwise happens inside compiled_flops' lower(), where a probe
    # failure used to poison the whole run to scan (round-3 bug)
    from seq2seq_abcd_vae_tpu.utils.backend_select import SELECTOR
    resolved_backend = SELECTOR.current()
    if args.skip_flops:
        flops = flops_model = None
    else:
        flops = compiled_flops(
            _train_step, params, opt_state, audio, nf, spk, key, 512.0,
            1.0, statics=statics, no_sample=False, bucket_frames=t, tx=tx)
        if resolved_backend == "scan":
            flops_model = flops
        else:
            flops_model = scan_backend_flops(
                _train_step, statics, params, opt_state, audio, nf, spk,
                key, 512.0, 1.0, no_sample=False, bucket_frames=t,
                tx=tx) or flops
    t0 = time.perf_counter()
    out = tr()
    wait(out)
    compile_s = time.perf_counter() - t0
    step_s = timeit(tr, n=5)
    params, opt_state = state["p"], state["o"]
    peak = peak_flops()
    mfu = (flops / step_s / peak) if (flops and peak) else None
    mfu_model = (flops_model / step_s / peak) if (flops_model and peak) \
        else None
    print(f"train_step  B={b} T={t}: compile {compile_s:6.1f}s  "
          f"step {step_s * 1e3:8.2f}ms  -> {b / step_s:8.1f} seg/s")
    if flops:
        print(f"  XLA-counted FLOPs/step: {flops / 1e9:.2f} GFLOP"
              + (f"  MFU (bf16 peak {peak / 1e12:.0f}T): {mfu * 100:.2f}%"
                 if mfu is not None else ""))
    if flops_model and flops_model != flops:
        print(f"  model FLOPs/step (scan lowering): "
              f"{flops_model / 1e9:.2f} GFLOP"
              + (f"  model MFU: {mfu_model * 100:.2f}%"
                 if mfu_model is not None else ""))
    report = {
        "device": jax.devices()[0].device_kind,
        "batch": b, "bucket": t, "precision": args.precision,
        "rnn_type": args.rnn_type,
        "bidir_decoder": args.bidir_decoder,
        "nll_fusion": os.environ.get("SEQ2SEQ_NLL_FUSION", "1"),
        "fused_cells": os.environ.get("SEQ2SEQ_FUSED_CELLS", ""),
        "compile_s": round(compile_s, 2),
        "train_step_ms": round(step_s * 1e3, 3),
        "segments_per_sec": round(b / step_s, 1),
        "flops_per_step": flops,
        "model_flops_per_step": flops_model,
        "mfu_bf16_peak": None if mfu is None else round(mfu, 5),
        "mfu_model": None if mfu_model is None else round(mfu_model, 5),
        "scan_unroll": os.environ.get("SEQ2SEQ_SCAN_UNROLL", "4"),
        "transfer_f32_ms": (None if transfer_s != transfer_s
                            else round(transfer_s * 1e3, 3)),
        "transfer_i16_ms": (None if transfer_i16_s != transfer_i16_s
                            else round(transfer_i16_s * 1e3, 3)),
    }
    from seq2seq_abcd_vae_tpu.utils.backend_select import backend_report
    report.update(backend_report())
    print("backend:", report.get("rnn_backend"),
          " probe-marginal-ms:", report.get("pallas_dispatch_ms"))

    if args.trace:
        # device-time breakdown: open with tensorboard or xprof
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                out = tr()
            wait(out)
        print(f"profiler trace written to {args.trace}")

    if args.ablate:
        ev = timeit(lambda: _eval_step(params, audio, nf, spk, key, 512.0,
                                       1.0, statics=statics, no_sample=False,
                                       bucket_frames=t), n=5)
        print(f"eval_step (fwd only):          {ev * 1e3:8.2f}ms")

        fe = jax.jit(lambda a: stft_ops.log_spectrogram(
            a, 128, 64, t, 2.0 ** -15, 11.0, method=args.stft_method))
        fet = timeit(fe, audio, n=10)
        print(f"frontend only:                 {fet * 1e3:8.2f}ms")

        spec = fe(audio)
        ef = jax.jit(lambda s: enc_mod.encoder_apply(params["encoder"],
                                                     cfg.encoder, s,
                                                     jax.numpy.asarray(nf)))
        et = timeit(ef, spec, n=10)
        print(f"encoder fwd only:              {et * 1e3:8.2f}ms")

        from seq2seq_abcd_vae_tpu.models import decoder as dec_mod
        feats = jax.numpy.asarray(
            rng.normal(size=(b, 256)).astype(np.float32))
        df = jax.jit(lambda f, s: dec_mod.decoder_apply(
            params["decoder"], cfg.decoder, f, jax.numpy.asarray(nf), t,
            speaker=jax.numpy.asarray(spk), ground_truth_out=s,
            ground_truth_offset=jax.numpy.zeros((b, t)),
            key=key).emission_loss)
        dt = timeit(df, feats, spec, n=5)
        print(f"decoder fwd only:              {dt * 1e3:8.2f}ms")
        report["ablations_ms"] = {
            "eval_step": round(ev * 1e3, 3),
            "frontend": round(fet * 1e3, 3),
            "encoder_fwd": round(et * 1e3, 3),
            "decoder_fwd": round(dt * 1e3, 3),
        }

    if args.out:
        import json
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    return report


if __name__ == "__main__":
    main()

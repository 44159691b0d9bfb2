"""Micro-profiler for the jitted train step on the local accelerator.

Times compile and steady-state step latency per (batch, bucket) shape and
a few ablations (encoder only, frontend only), to guide kernel work
without running the full bench.

Usage: python scripts/profile_step.py [--batch 512] [--bucket 512]
       [--precision default] [--ablate]
"""

import argparse
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)

import numpy as np
import jax


def timeit(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--bucket", type=int, default=512)
    ap.add_argument("--precision", type=str, default="default")
    ap.add_argument("--stft_method", type=str, default="fft")
    ap.add_argument("--ablate", action="store_true")
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

    enc = EncoderConfig(65, 256)
    lat = ABCDSamplerConfig(enc.hidden_size_total, 256, 128, 256)
    dec = DecoderConfig(65, 256, 256, 256, num_speakers=2,
                        speaker_embed_dim=256)
    cfg = vae.ModelConfig(enc, lat, dec)
    params = vae.model_init(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(1.0, 0.0, 1.0)
    opt_state = tx.init(params)
    statics = StepStatics(cfg, 128, 64, "hann_window", 2.0 ** -15, 11.0,
                          args.stft_method)

    b, t = args.batch, args.bucket
    buf = (t - 1) * 64 + 128
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(b, buf)) * 1000).astype(np.float32)
    nf = np.full((b,), t, np.int32)
    spk = (np.arange(b) % 2).astype(np.int32)
    key = jax.random.PRNGKey(0)

    def tr(p, o):
        return _train_step(p, o, audio, nf, spk, key, 512.0, 1.0,
                           statics=statics, no_sample=False,
                           bucket_frames=t, tx=tx)

    t0 = time.perf_counter()
    out = tr(params, opt_state)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    step_s = timeit(lambda: tr(params, opt_state), n=5)
    print(f"train_step  B={b} T={t}: compile {compile_s:6.1f}s  "
          f"step {step_s * 1e3:8.2f}ms  -> {b / step_s:8.1f} seg/s")

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


if __name__ == "__main__":
    main()

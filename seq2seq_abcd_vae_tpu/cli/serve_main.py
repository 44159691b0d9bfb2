"""Persistent encode server entry point (extension over the reference).

``ABCD-VAE/serve.py <checkpoint> <data_normalizer> <sample_freq>
--socket /run/abcd.sock`` keeps a process resident — params on device,
one compiled program per frame-count bucket — and answers NDJSON encode
requests over a Unix domain socket with dynamic micro-batching
(seq2seq_abcd_vae_tpu/serve/server.py).  The reference's encode
workflow (encode.py:83-108) restarts the interpreter, reloads the
checkpoint, and recompiles for every dataset; this serves the same
heads at one-dispatch steady-state latency.
"""

from __future__ import annotations

import argparse
import logging

from .flags import EPSILON_DEFAULT, _tpu_extras

logger = logging.getLogger(__name__)


def build_serve_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    a = p.add_argument
    a("model_path", type=str,
      help="Path to the configuration file of a trained model.")
    a("data_normalizer", type=float,
      help="Normalizing constant to devide the data.")
    a("sample_freq", type=int,
      help="Sampling rate the service compiles against; requests with a "
           "different fs are rejected.")
    a("--socket", type=str, default="abcd-vae.sock",
      help="Unix domain socket path to listen on.")
    a("--mode", type=str, default="probs",
      choices=["probs", "logits", "features", "params"],
      help="Which encode head to serve (the four encode CLIs).")
    a("-d", "--device", type=str, default="", help="Computing device.")
    a("--fft_frame_length", type=float, default=0.008,
      help="FFT frame length in sec.")
    a("--fft_step_size", type=float, default=0.004,
      help="FFT step size in sec.")
    a("--fft_window_type", type=str, default="hann_window",
      help='Window type for FFT. "hann_window" by default.')
    a("--fft_no_centering", action="store_true",
      help="If selected, no centering in FFT.")
    a("-E", "--epsilon", type=float, default=EPSILON_DEFAULT,
      help="Small positive real number to add to avoid log(0).")
    a("-b", "--batch_size", type=int, default=64,
      help="Compiled batch size per bucket (requests are padded to it).")
    a("--buckets", type=str, default=None,
      help="Comma-separated frame-count buckets (ascending). Default: "
           "16,32,64,96,128,192,256,384,512.")
    a("--max_wait_ms", type=float, default=5.0,
      help="Straggler window: after the first queued request, wait this "
           "long for companions before dispatching the micro-batch.")
    a("--no_warmup", action="store_true",
      help="Skip compiling all bucket shapes at startup.")
    _tpu_extras(p)
    return p


def main(argv=None) -> None:
    parameters = build_serve_parser().parse_args(argv)
    from ..utils import (enable_persistent_compilation_cache,
                         select_platforms)
    select_platforms(parameters.device)  # before any backend touch
    enable_persistent_compilation_cache()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    from ..serve import EncodeService, serve_forever
    kw = {}
    if parameters.buckets:
        kw["buckets"] = tuple(
            int(x) for x in parameters.buckets.split(","))
    service = EncodeService(
        parameters.model_path, parameters.data_normalizer,
        parameters.sample_freq, device=parameters.device,
        mode=parameters.mode,
        fft_frame_length=parameters.fft_frame_length,
        fft_step_size=parameters.fft_step_size,
        window=parameters.fft_window_type,
        epsilon=parameters.epsilon,
        centering=not parameters.fft_no_centering,
        stft_method=parameters.stft_method,
        batch_size=parameters.batch_size,
        max_wait_ms=parameters.max_wait_ms,
        matmul_precision=parameters.matmul_precision, **kw)
    if not parameters.no_warmup:
        logger.info("warming up %d bucket shapes (batch %d)...",
                    len(service.buckets), service.batch_size)
        service.warmup()
    logger.info("serving mode=%s fs=%d on %s", service.mode, service.fs,
                parameters.socket)
    try:
        serve_forever(service, parameters.socket)
    finally:
        service.close()

"""On-device batched frontend: centered raw audio -> log spectrograms.

One jitted program per bucket shape; composes with the train step under
the same jit so XLA fuses framing, DFT, log-rescale and the encoder's
first matmul.
"""

from __future__ import annotations

import functools

import jax

from ..ops import stft as stft_ops
from .batching import FrontendSpec, RawBatch


@functools.partial(jax.jit, static_argnames=(
    "frame_length", "step_size", "num_frames", "window", "method",
    "epsilon", "normalizer"))
def batch_log_spectrogram(audio: jax.Array, *, frame_length: int,
                          step_size: int, num_frames: int, epsilon: float,
                          normalizer: float, window: str = "hann_window",
                          method: str = "fft") -> jax.Array:
    """(B, L_bucket) centered audio -> (B, T_bucket, bins)."""
    return stft_ops.log_spectrogram(
        audio, frame_length, step_size, num_frames,
        epsilon, normalizer, window=window, method=method)


def spectrogram_of_batch(batch: RawBatch, fe: FrontendSpec, epsilon: float,
                         normalizer: float,
                         method: str = "fft") -> jax.Array:
    return batch_log_spectrogram(
        batch.audio, frame_length=fe.frame_length, step_size=fe.step_size,
        num_frames=batch.bucket_frames, epsilon=epsilon,
        normalizer=normalizer, window=fe.window, method=method)

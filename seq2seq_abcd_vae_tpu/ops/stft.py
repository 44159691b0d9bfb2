"""STFT amplitude frontend with torch.stft parity.

The reference computes, per segment and on the host CPU,
``|torch.stft(x, frame_length, hop, hann, center=True)|`` followed by
``log(x + eps) / N`` (reference: ABCD-VAE/modules/data_utils.py:124-139 and
ABCD-VAE/learning.py:464-466).  Here the whole chain is a jittable,
batched device function:

- reflection "centering" is materialized once on the host into the padded
  audio buffer (see ``data.audio.center_pad_segment``), so the device side
  is pure static-shaped framing;
- framing + window + DFT + |.| + log-rescale run on device, either via
  ``jnp.fft.rfft`` (correctness reference) or as two MXU matmuls against a
  precomputed windowed DFT basis (``method='matmul'``, the layout the
  Pallas kernel uses);
- everything is batched: (B, L_padded) audio -> (B, T, F) log-spectrogram.

Parity notes (verified against torch in tests/test_stft.py):
- torch.hann_window defaults to periodic=True: w[k] = 0.5*(1-cos(2*pi*k/n));
- torch.stft(center=True) reflect-pads n_fft//2 on both sides;
- frame count = 1 + (L + 2*(n_fft//2) - n_fft) // hop;
- onesided bins = n_fft//2 + 1, no normalization.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Windows (parity with torch.<name>(n), periodic=True defaults)
# ---------------------------------------------------------------------------

def _periodic_cosine_window(n: int, coeffs: tuple[float, ...]) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    w = np.zeros(n, dtype=np.float64)
    for j, a in enumerate(coeffs):
        w += a * np.cos(2.0 * math.pi * j * k / n) * ((-1.0) ** j)
    return w.astype(np.float32)


def hann_window(n: int) -> np.ndarray:
    return _periodic_cosine_window(n, (0.5, 0.5))


def hamming_window(n: int) -> np.ndarray:
    # torch default alpha=0.54, beta=0.46, periodic
    return _periodic_cosine_window(n, (0.54, 0.46))


def blackman_window(n: int) -> np.ndarray:
    return _periodic_cosine_window(n, (0.42, 0.5, 0.08))


def bartlett_window(n: int) -> np.ndarray:
    # torch.bartlett_window periodic: triangle over n+1 points, last dropped.
    k = np.arange(n, dtype=np.float64)
    w = 1.0 - np.abs(2.0 * k / n - 1.0)
    return w.astype(np.float32)


def kaiser_window(n: int, beta: float = 12.0) -> np.ndarray:
    # torch.kaiser_window defaults: periodic=True, beta=12.0.  Periodic
    # means the denominator half-width is n/2 (symmetric would use
    # (n-1)/2); i ranges over [0, n).
    k = np.arange(n, dtype=np.float64)
    half = n / 2.0
    arg = beta * np.sqrt(np.clip(1.0 - ((k - half) / half) ** 2, 0.0, None))
    w = np.i0(arg) / np.i0(beta)
    return w.astype(np.float32)


_WINDOWS = {
    "hann_window": hann_window,
    "hamming_window": hamming_window,
    "blackman_window": blackman_window,
    "bartlett_window": bartlett_window,
    "kaiser_window": kaiser_window,
}


def get_window(name: str, n: int) -> np.ndarray:
    """Window by torch attribute name (reference uses getattr(torch, window)
    with factory defaults, ABCD-VAE/modules/data_utils.py:125-129).

    Any torch window factory name the reference would accept is accepted
    here: names outside the native registry fall back to calling the
    torch factory itself (lazy import; torch-cpu is only touched on this
    cold path), and unknown names raise the same AttributeError the
    reference raises.
    """
    fn = _WINDOWS.get(name)
    if fn is not None:
        return fn(n)
    import torch  # lazy: only for exotic window names

    return getattr(torch, name)(n).numpy().astype(np.float32)


# ---------------------------------------------------------------------------
# Shape bookkeeping
# ---------------------------------------------------------------------------

def center_pad_amount(frame_length: int) -> int:
    """Samples of reflection padding torch.stft adds on each side."""
    return frame_length // 2


def stft_num_frames(num_samples: int, frame_length: int, step_size: int,
                    centering: bool = True) -> int:
    """Frame count matching torch.stft."""
    if centering:
        num_samples = num_samples + 2 * center_pad_amount(frame_length)
    if num_samples < frame_length:
        return 0
    return 1 + (num_samples - frame_length) // step_size


def num_freq_bins(frame_length: int) -> int:
    """Onesided bins; model input_size (reference: ABCD-VAE/learning.py:441)."""
    return frame_length // 2 + 1


# ---------------------------------------------------------------------------
# Device-side framing + DFT
# ---------------------------------------------------------------------------

def frame_padded_audio(audio: jax.Array, frame_length: int, step_size: int,
                       num_frames: int) -> jax.Array:
    """(..., L) already-centered audio -> (..., num_frames, frame_length).

    Pure gather with static shapes; XLA lowers this to an efficient strided
    read. Caller guarantees L >= (num_frames-1)*step + frame_length.
    """
    starts = np.arange(num_frames) * step_size
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    return audio[..., idx]


def dft_basis(frame_length: int, window: np.ndarray,
              dtype=np.float32) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis: (frame_length, bins) cos and -sin matrices.

    rfft(w*x)[f] = sum_k w_k x_k cos(2 pi k f / n) - i sum_k w_k x_k sin(...).
    Folding the window into the basis makes the whole frontend two matmuls —
    the MXU-friendly formulation used by the Pallas kernel.
    """
    n = frame_length
    bins = num_freq_bins(n)
    k = np.arange(n, dtype=np.float64)[:, None]
    f = np.arange(bins, dtype=np.float64)[None, :]
    ang = 2.0 * math.pi * k * f / n
    w = window.astype(np.float64)[:, None]
    return (np.cos(ang) * w).astype(dtype), (-np.sin(ang) * w).astype(dtype)


@functools.partial(jax.jit, static_argnames=(
    "frame_length", "step_size", "num_frames", "window", "method"))
def stft_amplitude(audio: jax.Array, frame_length: int, step_size: int,
                   num_frames: int, window: str = "hann_window",
                   method: str = "fft") -> jax.Array:
    """(..., L) centered audio -> (..., num_frames, bins) amplitude.

    method='fft'    : jnp.fft.rfft (reference path, exact)
    method='matmul' : two real matmuls against the windowed DFT basis (MXU)
    """
    frames = frame_padded_audio(audio, frame_length, step_size, num_frames)
    win_np = get_window(window, frame_length)
    if method == "fft":
        win = jnp.asarray(win_np, dtype=frames.dtype)
        spec = jnp.fft.rfft(frames * win, axis=-1)
        return jnp.abs(spec).astype(frames.dtype)
    if method == "matmul":
        cos_b, sin_b = dft_basis(frame_length, win_np)
        # HIGHEST precision: the DFT sum cancels catastrophically in quiet
        # bins, so bf16 MXU passes are not enough here.
        re = jnp.matmul(frames, jnp.asarray(cos_b),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        im = jnp.matmul(frames, jnp.asarray(sin_b),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        return jnp.sqrt(re * re + im * im).astype(frames.dtype)
    raise ValueError(f"unknown stft method: {method}")


def log_rescale(amplitude: jax.Array, epsilon: float,
                normalizer: float) -> jax.Array:
    """ln(x + eps) / N (reference: ABCD-VAE/learning.py:466)."""
    return jnp.log(amplitude + epsilon) / normalizer


# User-pluggable frontends — the TPU-native analogue of the reference's
# composable ToTensor/STFT/Transform/Compose chain (data_utils.py:106-148).
# Downstream users swap the frontend by registering a jittable function
#   fn(audio_f32 (B, L), frame_length, step_size, num_frames, epsilon,
#      normalizer, window) -> (B, num_frames, bins)
# and passing --stft_method custom:<name> (the name rides through
# StepStatics as a static string, so each frontend compiles into the
# whole-step XLA program like the built-ins).
_CUSTOM_FRONTENDS: dict = {}


def register_frontend(name: str, fn) -> None:
    """Register fn under 'custom:<name>'.  Register before first use:
    compiled programs key on the method STRING, so re-registering a
    different fn under a used name won't invalidate cached executables."""
    _CUSTOM_FRONTENDS[name] = fn


@functools.partial(jax.jit, static_argnames=(
    "frame_length", "step_size", "num_frames", "window", "method",
    "epsilon", "normalizer"))
def log_spectrogram(audio: jax.Array, frame_length: int, step_size: int,
                    num_frames: int, epsilon: float, normalizer: float,
                    window: str = "hann_window",
                    method: str = "fft") -> jax.Array:
    """Fused frontend: centered audio -> log-rescaled amplitude spectrogram.

    method='pallas' dispatches to the fused TPU kernel
    (ops/stft_pallas.py) when the geometry allows (frame == 2*step) and
    falls back to 'matmul' otherwise; method='custom:<name>' dispatches to
    a register_frontend() hook.
    """
    if jnp.issubdtype(audio.dtype, jnp.integer):
        # int16 transfer format (exact cast, matches the reference's
        # astype(float32), data_utils.py:94)
        audio = audio.astype(jnp.float32)
    if method.startswith("custom:"):
        fn = _CUSTOM_FRONTENDS.get(method[len("custom:"):])
        if fn is None:
            raise KeyError(
                "no frontend registered under %r; call "
                "seq2seq_abcd_vae_tpu.ops.stft.register_frontend" % method)
        return fn(audio, frame_length, step_size, num_frames, epsilon,
                  normalizer, window)
    if method == "pallas":
        from . import stft_pallas
        if stft_pallas.supports(frame_length, step_size) and audio.ndim == 2:
            return stft_pallas.log_spectrogram_pallas(
                audio, frame_length, step_size, num_frames, epsilon,
                normalizer, window=window,
                interpret=jax.default_backend() != "tpu")
        method = "matmul"
    amp = stft_amplitude(audio, frame_length, step_size, num_frames,
                         window=window, method=method)
    return log_rescale(amp, epsilon, normalizer)


# ---------------------------------------------------------------------------
# Single-segment reference path (tests / non-batched use)
# ---------------------------------------------------------------------------

def stft_single_segment(x: jax.Array, frame_length: int, step_size: int,
                        window: str = "hann_window",
                        centering: bool = True) -> jax.Array:
    """Torch-parity STFT amplitude of one 1-D segment, (T, bins) time-major
    (reference transposes to time-major, ABCD-VAE/modules/data_utils.py:136)."""
    if centering:
        pad = center_pad_amount(frame_length)
        x = jnp.pad(x, (pad, pad), mode="reflect")
    t = stft_num_frames(x.shape[-1], frame_length, step_size, centering=False)
    return stft_amplitude(x, frame_length, step_size, t, window=window)

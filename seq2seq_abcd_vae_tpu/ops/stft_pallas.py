"""Fused Pallas TPU kernel for the STFT frontend.

One kernel fuses the whole per-batch frontend chain the reference runs as
separate CPU ops (torch.stft -> amplitude -> log-rescale,
ABCD-VAE/modules/data_utils.py:131-139 + learning.py:466):

  frames -> window -> real DFT -> |.| -> log(x+eps)/N

Formulation: with the default geometry frame_length == 2*step_size
(8ms/4ms), frame t is the concatenation of contiguous "chunks"
c_t, c_{t+1} of step_size samples, so framing needs no overlapping reads:
the kernel reshapes its audio row into chunks in VMEM, builds the
(T, frame) frame matrix with one concat, and hits the MXU with two
(T, frame) x (frame, bins) matmuls against the windowed DFT bases
(window folded into the basis; see ops/stft.dft_basis).

The grid is one program per batch row; rows are independent, so the
kernel scales with batch and XLA pipelines HBM->VMEM block transfers.
For geometries with frame != 2*step the caller falls back to the XLA
paths in ops/stft.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import stft as stft_ops


def supports(frame_length: int, step_size: int) -> bool:
    return frame_length == 2 * step_size


def _kernel(audio_ref, cos_ref, sin_ref, out_ref, *, num_frames: int,
            step_size: int, epsilon: float, inv_normalizer: float):
    # audio row -> (num_frames+1, step) chunk matrix
    usable = (num_frames + 1) * step_size
    chunks = audio_ref[0, :usable].reshape(num_frames + 1, step_size)
    frames = jnp.concatenate([chunks[:num_frames], chunks[1:]], axis=1)
    re = jnp.dot(frames, cos_ref[:, :], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:, :], preferred_element_type=jnp.float32)
    amp = jnp.sqrt(re * re + im * im)
    out_ref[0] = jnp.log(amp + epsilon) * inv_normalizer


@functools.partial(jax.jit, static_argnames=(
    "frame_length", "step_size", "num_frames", "epsilon", "normalizer",
    "window", "interpret"))
def log_spectrogram_pallas(audio: jax.Array, frame_length: int,
                           step_size: int, num_frames: int, epsilon: float,
                           normalizer: float, window: str = "hann_window",
                           interpret: bool = False) -> jax.Array:
    """(B, L_buf) centered audio -> (B, T, bins) log spectrogram.

    Drop-in for ops.stft.log_spectrogram when frame_length == 2*step_size.
    """
    if not supports(frame_length, step_size):
        raise ValueError("pallas stft kernel requires frame == 2*step; "
                         "use method='fft'/'matmul'")
    b, l_buf = audio.shape
    bins = stft_ops.num_freq_bins(frame_length)
    win = stft_ops.get_window(window, frame_length)
    cos_b, sin_b = stft_ops.dft_basis(frame_length, win)

    kernel = functools.partial(
        _kernel, num_frames=num_frames, step_size=step_size,
        epsilon=epsilon, inv_normalizer=1.0 / normalizer)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, num_frames, bins), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l_buf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frame_length, bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frame_length, bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_frames, bins), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(audio, jnp.asarray(cos_b), jnp.asarray(sin_b))

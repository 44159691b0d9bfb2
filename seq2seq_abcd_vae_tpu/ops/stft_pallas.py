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


_ROWS = 8  # rows per program: TPU blocks need a sublane-multiple


def _kernel(chunks_ref, cos_ref, sin_ref, out_ref, *, num_frames: int,
            step_size: int, epsilon: float, inv_normalizer: float):
    # chunks_ref: (rows, num_frames+1, step) — chunked OUTSIDE the kernel
    # (Mosaic cannot relayout a lane split).  Frame t is the concat
    # [chunk_t | chunk_{t+1}], but Mosaic cannot lane-concat
    # sublane-shifted vectors either, so the DFT is split algebraically:
    #   re[t] = chunk_t @ cosL + chunk_{t+1} @ cosR
    # — two (T+1, step) x (step, bins) MXU matmuls per row and a
    # shifted add; the frame matrix never materializes, and
    # window/DFT/|.|/log all fuse into one kernel.
    t = num_frames
    cos_l, cos_r = cos_ref[:step_size, :], cos_ref[step_size:, :]
    sin_l, sin_r = sin_ref[:step_size, :], sin_ref[step_size:, :]
    # HIGHEST always: the DFT sum cancels catastrophically in quiet bins
    # under one-pass bf16 (same rule as the XLA matmul path, ops/stft.py)
    hi = jax.lax.Precision.HIGHEST
    for r in range(_ROWS):
        chunks = chunks_ref[r]
        re_a = jnp.dot(chunks, cos_l, preferred_element_type=jnp.float32,
                       precision=hi)
        re_b = jnp.dot(chunks, cos_r, preferred_element_type=jnp.float32,
                       precision=hi)
        im_a = jnp.dot(chunks, sin_l, preferred_element_type=jnp.float32,
                       precision=hi)
        im_b = jnp.dot(chunks, sin_r, preferred_element_type=jnp.float32,
                       precision=hi)
        re = re_a[:t] + pltpu.roll(re_b, t, 0)[:t]
        im = im_a[:t] + pltpu.roll(im_b, t, 0)[:t]
        amp = jnp.sqrt(re * re + im * im)
        out_ref[r, :, :] = jnp.log(amp + epsilon) * inv_normalizer


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

    # TPU block shapes need a sublane-multiple of rows; pad the batch to
    # _ROWS and slice the padding back off (silence rows are harmless:
    # log(0+eps) is finite).  The chunk view is materialized by XLA
    # outside the kernel — Mosaic cannot relayout a lane split.
    b_pad = -(-b // _ROWS) * _ROWS
    if b_pad != b:
        audio = jnp.pad(audio, ((0, b_pad - b), (0, 0)))
    usable = (num_frames + 1) * step_size
    chunks = audio[:, :usable].reshape(b_pad, num_frames + 1, step_size)

    kernel = functools.partial(
        _kernel, num_frames=num_frames, step_size=step_size,
        epsilon=epsilon, inv_normalizer=1.0 / normalizer)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, num_frames, bins),
                                       jnp.float32),
        grid=(b_pad // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, num_frames + 1, step_size),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((frame_length, bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frame_length, bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, num_frames, bins),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(chunks, jnp.asarray(cos_b), jnp.asarray(sin_b))
    return out[:b]

"""Fused Pallas STFT kernel parity vs the XLA rfft path (interpret mode
on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from seq2seq_abcd_vae_tpu.ops import stft as stft_ops
from seq2seq_abcd_vae_tpu.ops import stft_pallas

EPS = 2.0 ** -15


@pytest.mark.parametrize("t_frames", [32, 61])
def test_pallas_matches_fft_path(rng, t_frames):
    frame, step = 128, 64
    b = 3
    l_buf = (t_frames - 1) * step + frame
    audio = (rng.normal(size=(b, l_buf)) * 3000).astype(np.float32)
    want = np.asarray(stft_ops.log_spectrogram(
        jnp.asarray(audio), frame, step, t_frames, EPS, 11.0, method="fft"))
    got = np.asarray(stft_pallas.log_spectrogram_pallas(
        jnp.asarray(audio), frame, step, t_frames, EPS, 11.0,
        interpret=True))
    assert got.shape == want.shape == (b, t_frames, 65)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_method_pallas_dispatch_and_fallback(rng):
    # supported geometry -> kernel; unsupported (frame != 2*step) -> matmul
    frame, step = 128, 64
    t = 16
    audio = (rng.normal(size=(2, (t - 1) * step + frame)) * 100).astype(
        np.float32)
    a = np.asarray(stft_ops.log_spectrogram(jnp.asarray(audio), frame, step,
                                            t, EPS, 11.0, method="pallas"))
    b = np.asarray(stft_ops.log_spectrogram(jnp.asarray(audio), frame, step,
                                            t, EPS, 11.0, method="fft"))
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)

    frame2, step2 = 128, 32  # unsupported; must fall back, not crash
    t2 = stft_ops.stft_num_frames((t - 1) * step + frame, frame2, step2,
                                  centering=False)
    out = stft_ops.log_spectrogram(jnp.asarray(audio), frame2, step2, t2,
                                   EPS, 11.0, method="pallas")
    assert out.shape == (2, t2, 65)


def test_supports():
    assert stft_pallas.supports(128, 64)
    assert not stft_pallas.supports(128, 32)
    assert not stft_pallas.supports(127, 64)

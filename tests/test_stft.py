"""STFT frontend parity vs torch.stft (the reference's frontend,
ABCD-VAE/modules/data_utils.py:124-139)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from seq2seq_abcd_vae_tpu.ops import stft as stft_ops


def torch_stft_amplitude(x, frame_length, step, window_name="hann_window",
                         centering=True):
    win = getattr(torch, window_name)(frame_length)
    spec = torch.stft(torch.from_numpy(x), frame_length, hop_length=step,
                      window=win, center=centering, return_complex=True)
    return spec.abs().transpose(0, 1).contiguous().numpy()


@pytest.mark.parametrize("window", ["hann_window", "hamming_window",
                                    "blackman_window", "bartlett_window",
                                    "kaiser_window"])
def test_window_parity(window):
    for n in (128, 127, 64):
        ours = stft_ops.get_window(window, n)
        theirs = getattr(torch, window)(n).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_unknown_window_matches_reference_error():
    # Reference: getattr(torch, name) -> AttributeError for unknown names
    # (data_utils.py:128).
    with pytest.raises(AttributeError):
        stft_ops.get_window("nonexistent_window", 128)


def test_kaiser_window_stft_parity(rng):
    # End-to-end: --fft_window_type kaiser_window through the STFT chain.
    x = rng.normal(size=4000).astype(np.float32) * 1000.0
    frame, step = 128, 64
    ours = np.asarray(stft_ops.stft_single_segment(
        jnp.asarray(x), frame, step, window="kaiser_window"))
    theirs = torch_stft_amplitude(x, frame, step,
                                  window_name="kaiser_window")
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-2)


@pytest.mark.parametrize("length", [4000, 6837, 1000])
@pytest.mark.parametrize("centering", [True, False])
def test_stft_amplitude_parity(rng, length, centering):
    x = rng.normal(size=length).astype(np.float32) * 1000.0
    frame, step = 128, 64
    ours = np.asarray(stft_ops.stft_single_segment(
        jnp.asarray(x), frame, step, centering=centering))
    theirs = torch_stft_amplitude(x, frame, step, centering=centering)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-2)


def test_num_frames_matches_torch(rng):
    frame, step = 128, 64
    for length in (500, 4000, 4001, 4063, 4064):
        x = rng.normal(size=length).astype(np.float32)
        theirs = torch_stft_amplitude(x, frame, step).shape[0]
        assert stft_ops.stft_num_frames(length, frame, step) == theirs


def test_matmul_method_matches_fft(rng):
    frame, step = 128, 64
    x = rng.normal(size=(3, 4096)).astype(np.float32) * 3000.0
    t = stft_ops.stft_num_frames(4096, frame, step, centering=False)
    a_fft = stft_ops.stft_amplitude(jnp.asarray(x), frame, step, t,
                                    method="fft")
    a_mm = stft_ops.stft_amplitude(jnp.asarray(x), frame, step, t,
                                   method="matmul")
    np.testing.assert_allclose(np.asarray(a_fft), np.asarray(a_mm),
                               rtol=2e-4, atol=2e-2)


def test_log_rescale():
    amp = jnp.asarray([[1.0, 2.0], [0.0, 4.0]])
    eps, norm = 2.0 ** -15, 11.0
    got = stft_ops.log_rescale(amp, eps, norm)
    want = np.log(np.asarray(amp) + eps) / norm
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_custom_frontend_hook(rng):
    """register_frontend: a user frontend rides through the fused step as
    method='custom:<name>' (the reference's pluggable Compose chain,
    data_utils.py:106-148, TPU-natively)."""
    calls = {}

    def halved(audio, frame, step, num_frames, eps, norm, window):
        calls["hit"] = True
        base = stft_ops.log_spectrogram(audio, frame, step, num_frames,
                                        eps, norm, window=window)
        return base * 0.5

    stft_ops.register_frontend("halved", halved)
    x = rng.normal(size=(2, 1024)).astype(np.float32) * 3000.0
    t = stft_ops.stft_num_frames(1024, 128, 64, centering=False)
    got = stft_ops.log_spectrogram(jnp.asarray(x), 128, 64, t, 2.0 ** -15,
                                   11.0, method="custom:halved")
    want = stft_ops.log_spectrogram(jnp.asarray(x), 128, 64, t, 2.0 ** -15,
                                    11.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want) * 0.5,
                               rtol=1e-6)
    assert calls["hit"]
    import pytest
    with pytest.raises(KeyError, match="register_frontend"):
        stft_ops.log_spectrogram(jnp.asarray(x), 128, 64, t, 2.0 ** -15,
                                 11.0, method="custom:missing")

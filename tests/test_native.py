"""Native C++ wav reader / batch assembler parity vs the Python path."""

import numpy as np
import pytest
import scipy.io.wavfile as spw

from seq2seq_abcd_vae_tpu import native
from seq2seq_abcd_vae_tpu.data.audio import center_pad_segment

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_read_wav_matches_scipy_mono(tmp_path, rng):
    wav = (rng.normal(size=5000) * 8000).astype(np.int16)
    path = tmp_path / "m.wav"
    spw.write(path, 16000, wav)
    fs, data = native.read_wav(str(path), 0)
    assert fs == 16000
    np.testing.assert_array_equal(data, wav.astype(np.float32))


def test_read_wav_matches_scipy_multichannel(tmp_path, rng):
    wav = (rng.normal(size=(3000, 2)) * 8000).astype(np.int16)
    path = tmp_path / "s.wav"
    spw.write(path, 22050, wav)
    for ch in (0, 1):
        fs, data = native.read_wav(str(path), ch)
        assert fs == 22050
        np.testing.assert_array_equal(data, wav[:, ch].astype(np.float32))


def test_read_wav_float32_format(tmp_path, rng):
    wav = rng.normal(size=2000).astype(np.float32)
    path = tmp_path / "f.wav"
    spw.write(path, 16000, wav)
    fs, data = native.read_wav(str(path), 0)
    np.testing.assert_array_equal(data, wav)


def test_assemble_matches_numpy_reflection(rng):
    pad = 64
    lengths = [4000, 1000, 200]
    segs = [rng.normal(size=l).astype(np.float32) for l in lengths]
    row = 4200 + 2 * pad
    want = np.zeros((3, row), np.float32)
    for i, s in enumerate(segs):
        center_pad_segment(s, pad, want[i])
    got = np.zeros((3, row), np.float32)
    assert native.assemble_batch(segs,
                                 np.zeros(3, np.int64),
                                 np.asarray(lengths, np.int64), pad, got)
    np.testing.assert_array_equal(got, want)


def test_assemble_no_centering(rng):
    segs = [rng.normal(size=l).astype(np.float32) for l in (100, 50)]
    out = np.zeros((2, 120), np.float32)
    assert native.assemble_batch(segs, np.zeros(2, np.int64),
                                 np.asarray([100, 50], np.int64), 0, out)
    np.testing.assert_array_equal(out[0, :100], segs[0])
    np.testing.assert_array_equal(out[1, :50], segs[1])
    np.testing.assert_array_equal(out[1, 50:], 0.0)


def test_loader_native_equals_python(tmp_path, rng):
    """Full DataLoader output identical with native on vs off."""
    import pandas as pd
    from seq2seq_abcd_vae_tpu.data.annotations import AnnotationParser
    from seq2seq_abcd_vae_tpu.data.batching import DataLoader, FrontendSpec
    wav = (rng.normal(size=32000) * 5000).astype(np.int16)
    spw.write(tmp_path / "x.wav", 16000, wav)
    pd.DataFrame([("x.wav", 0.1, 0.9, "train"), ("x.wav", 1.0, 1.4, "train"),
                  ("x.wav", 1.5, 1.9, "train")],
                 columns=["input_path", "onset", "offset",
                          "data_type"]).to_csv(tmp_path / "a.csv",
                                               index=False)
    fe = FrontendSpec(128, 64)

    def batches(use_native):
        p = AnnotationParser(str(tmp_path), str(tmp_path / "a.csv"))
        p.wav_cache.use_native = use_native
        ds = p.get_data("train")
        loader = DataLoader(ds, fe, batch_size=3)
        if not use_native:
            loader._assemble_native = lambda *a, **k: False
        return list(loader)

    for b_nat, b_py in zip(batches(True), batches(False)):
        np.testing.assert_array_equal(b_nat.audio, b_py.audio)
        np.testing.assert_array_equal(b_nat.num_frames, b_py.num_frames)

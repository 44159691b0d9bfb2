"""Device-resident corpus cache (data/device_cache.py): the on-device
batch gather must reproduce host assembly bit-for-bit, and a Learner run
with the cache must be bit-identical to the streaming path."""

import os

import numpy as np
import pandas as pd
import pytest
import scipy.io.wavfile as spw

from seq2seq_abcd_vae_tpu.data.annotations import AnnotationParser
from seq2seq_abcd_vae_tpu.data.batching import DataLoader, FrontendSpec
from seq2seq_abcd_vae_tpu.data.device_cache import DeviceCorpusCache
from seq2seq_abcd_vae_tpu.train.learner import Learner

FS = 16000


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.default_rng(3)
    wav = (rng.normal(size=4 * FS) * 3000).astype(np.int16)
    spw.write(tmp_path / "x.wav", FS, wav)
    # a float32 wav makes the corpus mixed-dtype (flat cache goes f32)
    wavf = rng.normal(size=2 * FS).astype(np.float32) * 0.3
    spw.write(tmp_path / "y.wav", FS, wavf)
    rows, cursor = [], 0.05
    for i in range(9):
        dur = 0.11 + 0.06 * (i % 4)  # mixed lengths -> several buckets
        rows.append(("x.wav", round(cursor, 3), round(cursor + dur, 3),
                     "train", "a" if i % 2 else "b", "A"))
        cursor += dur + 0.02
    rows.append(("y.wav", 0.1, 0.42, "train", "a", "B"))
    df = pd.DataFrame(rows, columns=["input_path", "onset", "offset",
                                     "data_type", "speaker", "label"])
    df.to_csv(tmp_path / "ann.csv", index=False)
    return tmp_path


def _host_vs_cache(dataset, fe, batch_size, pad_to_batch_size,
                   batching_mode="bucket_shuffled"):
    import jax

    loader = DataLoader(dataset, fe, batch_size=batch_size, shuffle=True,
                        seed=7, batching_mode=batching_mode,
                        pad_to_batch_size=pad_to_batch_size)
    cache = DeviceCorpusCache.build(dataset, fe, jax.devices("cpu")[0])
    assert cache is not None
    seen = 0
    for batch in loader:
        audio, nf, spk = (np.asarray(a) for a in cache.place(batch))
        assert nf.dtype == batch.num_frames.dtype
        np.testing.assert_array_equal(nf, batch.num_frames)
        np.testing.assert_array_equal(spk, batch.speakers)
        # dtype may widen int16->f32 when the corpus is mixed; values
        # must match exactly either way
        np.testing.assert_array_equal(
            audio.astype(np.float64), batch.audio.astype(np.float64))
        seen += batch.num_real
    assert seen == len(dataset)


def test_stage_epoch_matches_per_batch_place(corpus):
    import jax

    p = AnnotationParser(str(corpus), str(corpus / "ann.csv"))
    ds = p.get_data("train")
    fe = FrontendSpec(128, 64)
    loader = DataLoader(ds, fe, batch_size=4, shuffle=True, seed=5,
                        batching_mode="bucket_shuffled",
                        pad_to_batch_size=False)
    cache = DeviceCorpusCache.build(ds, fe, jax.devices("cpu")[0])
    epoch = list(loader)
    staged = cache.stage_epoch(epoch)
    assert len(staged) == len(epoch)
    for batch, pos in zip(epoch, staged):
        a1, n1, s1 = (np.asarray(x) for x in cache.place(batch, pos))
        a2, n2, s2 = (np.asarray(x) for x in cache.place(batch))
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_array_equal(s1, s2)


@pytest.mark.parametrize("pad_to_batch_size", [False, True])
def test_gather_matches_host_assembly(corpus, pad_to_batch_size):
    p = AnnotationParser(str(corpus), str(corpus / "ann.csv"))
    ds = p.get_data("train")
    _host_vs_cache(ds, FrontendSpec(128, 64), batch_size=4,
                   pad_to_batch_size=pad_to_batch_size)


def test_gather_matches_without_centering(corpus):
    p = AnnotationParser(str(corpus), str(corpus / "ann.csv"))
    ds = p.get_data("train")
    _host_vs_cache(ds, FrontendSpec(128, 64, centering=False),
                   batch_size=3, pad_to_batch_size=False)


def test_short_segment_disables_cache(tmp_path):
    # a segment shorter than the reflect pad cannot be centered; build
    # must decline (the streaming path raises its diagnostic instead)
    import jax

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=FS) * 2000).astype(np.int16)
    spw.write(tmp_path / "s.wav", FS, wav)
    df = pd.DataFrame([("s.wav", 0.0, 0.002, "train", "a", "A")],
                      columns=["input_path", "onset", "offset",
                               "data_type", "speaker", "label"])
    df.to_csv(tmp_path / "ann.csv", index=False)
    p = AnnotationParser(str(tmp_path), str(tmp_path / "ann.csv"))
    ds = p.get_data("train")
    fe = FrontendSpec(128, 64)
    assert DeviceCorpusCache.build(ds, fe, jax.devices("cpu")[0]) is None


def test_synthetic_build_matches_layout(corpus, monkeypatch):
    # bench.py's timing-only cache (SEQ2SEQ_DEVICE_CACHE_SYNTH=1) must
    # match the real build in every timing-relevant respect — shapes,
    # dtype, stride, zero tails, frames/speaker metadata — so the
    # compute graph (and therefore the measured step time) is identical;
    # only the row CONTENT may differ.
    import jax

    p = AnnotationParser(str(corpus), str(corpus / "ann.csv"))
    ds = p.get_data("train")
    fe = FrontendSpec(128, 64)
    dev = jax.devices("cpu")[0]
    real = DeviceCorpusCache.build(ds, fe, dev)
    monkeypatch.setenv("SEQ2SEQ_DEVICE_CACHE_SYNTH", "1")
    synth = DeviceCorpusCache.build(ds, fe, dev)  # env-routed
    assert synth is not None
    rr, rs = np.asarray(real.rows), np.asarray(synth.rows)
    assert rr.shape == rs.shape
    np.testing.assert_array_equal(np.asarray(real.frames),
                                  np.asarray(synth.frames))
    np.testing.assert_array_equal(np.asarray(real.speakers),
                                  np.asarray(synth.speakers))
    # zero-tail layout: content extent per row equals the real build's
    pad = fe.pad
    row_samples = ds.lengths_np + 2 * pad
    for i, rn in enumerate(row_samples):
        assert not np.any(rs[i, rn:]), "tail must be zero-filled"
        assert np.any(rs[i, :rn]), "content must be nonzero noise"
    # gather through the same jit path produces same-shaped batches
    loader = DataLoader(ds, fe, batch_size=4, shuffle=False,
                        batching_mode="bucket_shuffled",
                        pad_to_batch_size=False)
    for batch in loader:
        a1, n1, s1 = real.place(batch)
        a2, n2, s2 = synth.place(batch)
        assert a1.shape == a2.shape and a1.dtype == a2.dtype
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_synthetic_build_declines_short_segment(tmp_path, monkeypatch):
    import jax

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=FS) * 2000).astype(np.int16)
    spw.write(tmp_path / "s.wav", FS, wav)
    df = pd.DataFrame([("s.wav", 0.0, 0.002, "train", "a", "A")],
                      columns=["input_path", "onset", "offset",
                               "data_type", "speaker", "label"])
    df.to_csv(tmp_path / "ann.csv", index=False)
    p = AnnotationParser(str(tmp_path), str(tmp_path / "ann.csv"))
    ds = p.get_data("train")
    monkeypatch.setenv("SEQ2SEQ_DEVICE_CACHE_SYNTH", "1")
    fe = FrontendSpec(128, 64)
    assert DeviceCorpusCache.build(ds, fe, jax.devices("cpu")[0]) is None


def _train_params(corpus, save_dir, device_corpus_cache):
    learner = Learner(
        input_size=65, encoder_rnn_hidden_size=16,
        decoder_rnn_hidden_size=16, mlp_hidden_size=16,
        save_dir=str(save_dir), latent_type="abcd",
        num_feature_categories=5, feature_dim=8, seed=1111,
        device="cpu", device_corpus_cache=device_corpus_cache)
    parser = AnnotationParser(str(corpus), str(corpus / "ann.csv"))
    train = parser.get_data("train")
    fe = FrontendSpec(128, 64)
    learner.learn(train, train, 2, batch_size_train=4, batch_size_valid=4,
                  frontend=fe, data_normalizer=11.0, pretrain_epochs=1,
                  learning_rate=0.5, momentum=0.0, gradient_clip=1.0,
                  patience=0)
    return learner.params


def test_learner_bit_parity_cache_vs_streaming(corpus, tmp_path):
    a = tmp_path / "cached"
    b = tmp_path / "streamed"
    a.mkdir(), b.mkdir()
    pa = _train_params(corpus, a, "on")
    pb = _train_params(corpus, b, "off")
    flat_a, _ = __import__("jax").tree_util.tree_flatten(pa)
    flat_b, _ = __import__("jax").tree_util.tree_flatten(pb)
    assert len(flat_a) == len(flat_b)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))

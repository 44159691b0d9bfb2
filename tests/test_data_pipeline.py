"""End-to-end data pipeline parity: CSV -> segments -> centered audio ->
device STFT vs the reference chain (scipy read + slice + torch.stft + log)
(reference: ABCD-VAE/modules/data_utils.py + learning.py:464-466)."""

import os

import numpy as np
import pandas as pd
import pytest
import scipy.io.wavfile as spw
import torch

from seq2seq_abcd_vae_tpu.data.annotations import AnnotationParser
from seq2seq_abcd_vae_tpu.data.batching import DataLoader, FrontendSpec
from seq2seq_abcd_vae_tpu.data.frontend import spectrogram_of_batch

FS = 16000
EPS = 2.0 ** -15
NORM = 11.0


@pytest.fixture
def toy_root(tmp_path):
    rng = np.random.default_rng(7)
    wav = (rng.normal(size=5 * FS) * 3000).astype(np.int16)
    spw.write(tmp_path / "a.wav", FS, wav)
    wav2 = np.stack([
        (rng.normal(size=3 * FS) * 2000), (rng.normal(size=3 * FS) * 500),
    ], axis=1).astype(np.int16)
    spw.write(tmp_path / "b.wav", FS, wav2)
    rows = [
        ("a.wav", 0.38, 0.81, "train", "s1", "A"),
        ("a.wav", 0.81, 1.375, "train", "s2", "A"),
        ("a.wav", 1.375, 1.9, "valid", "s1", "B"),
        ("a.wav", 1.9, 2.15, "train", "s1", "C"),
        ("b.wav", 0.2, 1.6, "train", "s2", "C"),
        ("b.wav", 1.6, 2.9, "valid", "s2", "B"),
        ("b.wav", 0.1, 2.7, "train", "s1", "A"),
    ]
    df = pd.DataFrame(rows, columns=["input_path", "onset", "offset",
                                     "data_type", "speaker", "label"])
    df.to_csv(tmp_path / "ann.csv", index=False)
    return tmp_path


def reference_segment_spectrogram(root, row, frame, step, channel=0):
    """The reference's per-segment torch pipeline as an oracle."""
    fs, data = spw.read(os.path.join(root, row["input_path"]))
    if data.ndim > 1:
        data = data[:, channel]
    onset = int(round(row["onset"] * fs))
    offset = int(round(row["offset"] * fs))
    x = torch.from_numpy(data[onset:offset].astype(np.float32))
    spec = torch.stft(x, frame, hop_length=step,
                      window=torch.hann_window(frame), center=True,
                      return_complex=True).abs().transpose(0, 1)
    return (torch.log(spec + EPS) / NORM).numpy()


def test_parser_speakers_and_bounds(toy_root):
    p = AnnotationParser(str(toy_root), str(toy_root / "ann.csv"))
    assert p.get_sample_freq() == FS
    assert p.get_num_speakers() == 2
    assert p.speaker2ix == {"s1": 0, "s2": 1}
    train = p.get_data("train")
    valid = p.get_data("valid")
    assert len(train) == 5 and len(valid) == 2
    allset = p.get_data(None)
    assert len(allset) == 7


def test_injected_speaker_coding(toy_root):
    inject = {"s2": 0, "s1": 1}
    p = AnnotationParser(str(toy_root), str(toy_root / "ann.csv"),
                         speaker2ix=inject)
    assert p.speaker2ix == inject
    ds = p.get_data("train")
    first = ds.df_annotation.index[0]
    assert ds.speaker_id(first) == inject[ds.df_annotation.loc[first,
                                                               "speaker"]]


def test_pipeline_matches_reference_chain(toy_root):
    frame, step = 128, 64
    p = AnnotationParser(str(toy_root), str(toy_root / "ann.csv"))
    ds = p.get_data("train")
    fe = FrontendSpec(frame, step)
    loader = DataLoader(ds, fe, batch_size=3, shuffle=False)
    seen = set()
    for batch in loader:
        spec = np.asarray(spectrogram_of_batch(batch, fe, EPS, NORM))
        for i, ix in enumerate(batch.ixs):
            row = ds.df_annotation.loc[ix]
            want = reference_segment_spectrogram(str(toy_root), row, frame,
                                                 step)
            t = batch.num_frames[i]
            assert t == want.shape[0]
            np.testing.assert_allclose(spec[i, :t], want, rtol=2e-4,
                                       atol=2e-4, err_msg=f"segment {ix}")
            seen.add(ix)
        # padding rows are zero-length
        for i in range(batch.num_real, batch.audio.shape[0]):
            assert batch.num_frames[i] == 0
    assert seen == set(ds.df_annotation.index)


def test_multichannel_selection(toy_root):
    frame, step = 128, 64
    p = AnnotationParser(str(toy_root), str(toy_root / "ann.csv"))
    ds = p.get_data("valid", channel=1)
    fe = FrontendSpec(frame, step)
    loader = DataLoader(ds, fe, batch_size=2)
    batch = next(iter(loader))
    spec = np.asarray(spectrogram_of_batch(batch, fe, EPS, NORM))
    for i, ix in enumerate(batch.ixs):
        row = ds.df_annotation.loc[ix]
        if row["input_path"] != "b.wav":
            continue
        want = reference_segment_spectrogram(str(toy_root), row, frame, step,
                                             channel=1)
        np.testing.assert_allclose(spec[i, :batch.num_frames[i]], want,
                                   rtol=2e-4, atol=2e-4)


def test_batches_sorted_desc_and_shuffle_covers_all(toy_root):
    p = AnnotationParser(str(toy_root), str(toy_root / "ann.csv"))
    ds = p.get_data("train")
    fe = FrontendSpec(128, 64)
    loader = DataLoader(ds, fe, batch_size=2, shuffle=True, seed=3)
    seen = []
    for batch in loader:
        lens = ds.df_annotation.loc[batch.ixs, "length"].to_numpy()
        assert (np.diff(lens) <= 0).all()
        seen += batch.ixs
    assert sorted(seen) == sorted(ds.df_annotation.index)
    # different epoch, different order (w.h.p.)
    seen2 = [ix for b in loader for ix in b.ixs]
    assert sorted(seen2) == sorted(seen)


def test_no_centering(toy_root):
    frame, step = 128, 64
    p = AnnotationParser(str(toy_root), str(toy_root / "ann.csv"))
    ds = p.get_data("train")
    fe = FrontendSpec(frame, step, centering=False)
    loader = DataLoader(ds, fe, batch_size=5)
    batch = next(iter(loader))
    spec = np.asarray(spectrogram_of_batch(batch, fe, EPS, NORM))
    row = ds.df_annotation.loc[batch.ixs[0]]
    fs, data = spw.read(os.path.join(str(toy_root), row["input_path"]))
    if data.ndim > 1:
        data = data[:, 0]
    x = torch.from_numpy(
        data[int(round(row["onset"] * fs)):int(round(row["offset"] * fs))]
        .astype(np.float32))
    want = torch.stft(x, frame, hop_length=step,
                      window=torch.hann_window(frame),
                      center=False, return_complex=True).abs().T
    want = (torch.log(want + EPS) / NORM).numpy()
    np.testing.assert_allclose(spec[0, :batch.num_frames[0]], want,
                               rtol=2e-4, atol=2e-4)


def test_missing_columns_clear_error(tmp_path):
    import pandas as pd
    pd.DataFrame({"path": ["x.wav"], "start": [0.1]}).to_csv(
        tmp_path / "bad.csv", index=False)
    with pytest.raises(ValueError, match="missing required column"):
        AnnotationParser(str(tmp_path), str(tmp_path / "bad.csv"))


def test_mixed_sample_rate_warns(tmp_path, rng):
    import warnings

    import pandas as pd
    spw.write(tmp_path / "a16k.wav", 16000,
              (rng.normal(size=16000) * 100).astype(np.int16))
    spw.write(tmp_path / "b22k.wav", 22050,
              (rng.normal(size=22050) * 100).astype(np.int16))
    pd.DataFrame([
        ("a16k.wav", 0.1, 0.5, "train"), ("b22k.wav", 0.1, 0.5, "train"),
    ], columns=["input_path", "onset", "offset", "data_type"]).to_csv(
        tmp_path / "ann.csv", index=False)
    p = AnnotationParser(str(tmp_path), str(tmp_path / "ann.csv"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        p.get_data("train")
    assert any("fs=" in str(x.message) for x in w)


# ------------------------------------------------------ bucket-edge schemes
# (round-5: composition-matched edges replace quantile buckets as the
# padding-waste lever — reference anchor: the per-batch pack_sequence
# semantics these schemes replace, data_utils.py:150-185)

def _row_waste(counts, edges):
    """Padded-frame waste fraction if each row pads to its smallest
    covering edge (the DataLoader's row->bucket rule)."""
    counts = np.sort(np.asarray(counts))
    edges = np.sort(np.asarray(edges))
    assert edges[-1] >= counts[-1], "edges must cover the longest row"
    assigned = edges[np.searchsorted(edges, counts, side="left")]
    return float((assigned - counts).sum() / assigned.sum())


def test_optimal_edges_beat_quantile_and_cover():
    from seq2seq_abcd_vae_tpu.data.batching import (optimal_bucket_edges,
                                                    quantile_bucket_edges)
    rng = np.random.default_rng(11)
    counts = np.concatenate([
        rng.integers(40, 90, 600),        # dense short mode
        rng.integers(200, 520, 80),       # sparse long tail
    ])
    q = quantile_bucket_edges(counts, num_buckets=6, min_bucket=32)
    d = optimal_bucket_edges(counts, num_buckets=6, min_bucket=32)
    assert max(d) >= counts.max()
    assert all(e % 8 == 0 and e >= 32 for e in d)
    assert len(d) <= 6
    assert _row_waste(counts, d) <= _row_waste(counts, q) + 1e-12


def test_optimal_edges_match_bruteforce():
    from itertools import combinations

    from seq2seq_abcd_vae_tpu.data.batching import optimal_bucket_edges
    rng = np.random.default_rng(3)
    counts = rng.integers(30, 200, 40)
    uniq = np.unique(counts)
    roundup = np.maximum(32, -(-uniq // 8) * 8)
    K = 3

    def waste_for_cuts(cuts):
        # cuts: indices into uniq marking the LAST element of each group
        lo = 0
        total = 0
        for c in cuts:
            grp = (counts >= uniq[lo]) & (counts <= uniq[c])
            total += (roundup[c] - counts[grp]).sum()
            lo = c + 1
        return total

    best = min(
        waste_for_cuts(cuts + (len(uniq) - 1,))
        for k in range(K)
        for cuts in combinations(range(len(uniq) - 1), k))
    edges = optimal_bucket_edges(counts, num_buckets=K, min_bucket=32)
    got = (np.sort(edges)[np.searchsorted(np.sort(edges), counts)]
           - counts).sum()
    assert got == best


def test_chunk_edges_are_band_maxes():
    from seq2seq_abcd_vae_tpu.data.batching import chunk_optimal_bucket_edges
    rng = np.random.default_rng(5)
    counts = rng.integers(40, 400, 257)
    B = 64
    s = np.sort(counts)
    want = sorted({int(max(s[i:i + B].max(), 33))
                   for i in range(0, len(s), B)})
    got = chunk_optimal_bucket_edges(counts, batch_size=B,
                                     num_buckets=16, min_bucket=33)
    assert got == want
    assert max(got) >= counts.max()


def test_chunk_edges_respect_budget():
    from seq2seq_abcd_vae_tpu.data.batching import chunk_optimal_bucket_edges
    rng = np.random.default_rng(9)
    counts = rng.integers(40, 4000, 2048)
    got = chunk_optimal_bucket_edges(counts, batch_size=8,
                                     num_buckets=12, min_bucket=32)
    assert len(got) <= 12
    assert max(got) >= counts.max()


def test_loader_bucket_policy_env(toy_root, monkeypatch):
    p = AnnotationParser(str(toy_root), str(toy_root / "ann.csv"))
    ds = p.get_data("train")
    fe = FrontendSpec(128, 64)
    loaders = {}
    for policy in ("chunk", "quantile", "dp"):
        monkeypatch.setenv("SEQ2SEQ_BUCKET_POLICY", policy)
        loaders[policy] = DataLoader(ds, fe, batch_size=2, shuffle=True,
                                     seed=1)
    for policy, loader in loaders.items():
        for batch in loader:
            real = batch.num_frames[:batch.num_real]
            assert batch.bucket_frames >= real.max(), policy
            assert batch.bucket_frames in loader.bucket_edges, policy

"""CLI end-to-end: train via the drop-in scripts' mains, then run all four
encode variants and validate CSV layouts (reference: ABCD-VAE/learning.py
__main__, encode*.py, plain/*)."""

import json
import os

import numpy as np
import pandas as pd
import pytest
import scipy.io.wavfile as spw

from seq2seq_abcd_vae_tpu.cli.encode_main import main as encode_main
from seq2seq_abcd_vae_tpu.cli.learning_main import main as learning_main

FS = 16000


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    root = tmp_path_factory.mktemp("toydata")
    rng = np.random.default_rng(5)
    wav = (rng.normal(size=int(2.5 * FS)) * 5000).astype(np.int16)
    spw.write(root / "x.wav", FS, wav)
    rows, cursor = [], 0.05
    for i in range(8):
        dur = 0.18 + 0.04 * (i % 3)
        dt = "valid" if i in (2, 6) else "train"
        rows.append(("x.wav", round(cursor, 3), round(cursor + dur, 3), dt,
                     ["a", "b"][i % 2], "ABC"[i % 3]))
        cursor += dur + 0.03
    pd.DataFrame(rows, columns=["input_path", "onset", "offset", "data_type",
                                "speaker", "label"]).to_csv(
        root / "ann.csv", index=False)
    return root


COMMON = ["-e", "2", "-b", "4", "--encoder_rnn_hidden_size", "8",
          "--decoder_rnn_hidden_size", "8", "--mlp_hidden_size", "8",
          "-N", "11.0", "-l", "0.1"]


@pytest.fixture(scope="module")
def abcd_run(toy, tmp_path_factory):
    save_root = tmp_path_factory.mktemp("results")
    learning_main("abcd", [str(toy), str(toy / "ann.csv"), "-S",
                           str(save_root), "-j", "run-1", "-K", "4", "-f",
                           "6", "--pretrain_epochs", "1",
                           "--speaker_embed_dim", "4"] + COMMON)
    return save_root / "run-1"


@pytest.fixture(scope="module")
def plain_run(toy, tmp_path_factory):
    save_root = tmp_path_factory.mktemp("results-plain")
    learning_main("plain", [str(toy), str(toy / "ann.csv"), "-S",
                            str(save_root), "-j", "run-1", "-f", "6"]
                  + COMMON)
    return save_root / "run-1"


def test_abcd_training_artifacts(abcd_run):
    assert os.path.isfile(abcd_run / "checkpoint.pt")
    assert os.path.isfile(abcd_run / "history.log")
    coding = json.load(open(abcd_run / "speaker_coding.json"))
    assert coding == {"a": 0, "b": 1}
    log = open(abcd_run / "history.log").read()
    assert "END OF TRAINING" in log
    assert "END OF PRETRAINING." in log


def test_encode_probs_csv(abcd_run, toy, tmp_path):
    out = tmp_path / "probs.csv"
    encode_main("probs", [str(abcd_run / "checkpoint.pt"), str(toy),
                          str(toy / "ann.csv"), "11.0", "-S", str(out),
                          "-b", "4"])
    df = pd.read_csv(out)
    assert list(df.columns[:3]) == ["data_ix", "category_ix", "prob"]
    assert {"input_path", "onset", "offset", "data_type", "speaker",
            "label"} <= set(df.columns)
    assert sorted(df.data_ix.unique()) == list(range(8))
    assert sorted(df.category_ix.unique()) == [0, 1, 2, 3]
    sums = df.groupby("data_ix").prob.sum()
    np.testing.assert_allclose(sums.to_numpy(), 1.0, atol=1e-4)
    # .prev chain
    encode_main("probs", [str(abcd_run / "checkpoint.pt"), str(toy),
                          str(toy / "ann.csv"), "11.0", "-S", str(out)])
    assert os.path.isfile(str(out) + ".prev")


def test_encode_logits_csv(abcd_run, toy, tmp_path):
    out = tmp_path / "logits.csv"
    encode_main("logits", [str(abcd_run / "checkpoint.pt"), str(toy),
                           str(toy / "ann.csv"), "11.0", "-S", str(out),
                           "-b", "8"])
    df = pd.read_csv(out)
    assert list(df.columns[:3]) == ["data_ix", "dimension", "logit"]
    assert len(df) == 8 * 4


def test_encode_features_csv(abcd_run, toy, tmp_path):
    out = tmp_path / "features.csv"
    encode_main("features", [str(abcd_run / "checkpoint.pt"), str(toy),
                             str(toy / "ann.csv"), "11.0", "-S", str(out)])
    df = pd.read_csv(out)
    assert list(df.columns[:3]) == ["data_ix", "dimension", "feature_value"]
    assert len(df) == 8 * 6  # feature_dim columns


def test_encode_npz_sidecar(abcd_run, plain_run, toy, tmp_path):
    """--save_format npz stores the exact float32 values the CSV
    formats (shortest-repr text round-trips bit-identically)."""
    csv_out = tmp_path / "p.csv"
    npz_out = tmp_path / "p.npz"
    args = [str(abcd_run / "checkpoint.pt"), str(toy), str(toy / "ann.csv"),
            "11.0", "-b", "4"]
    encode_main("probs", args + ["-S", str(csv_out)])
    encode_main("probs", args + ["-S", str(npz_out), "--save_format",
                                 "npz"])
    z = np.load(npz_out)
    assert str(z["mode"]) == "probs"
    df = pd.read_csv(csv_out)
    assert sorted(z["data_ix"].tolist()) == sorted(df.data_ix.unique())
    for row, ix in enumerate(z["data_ix"]):
        sub = df[df.data_ix == ix].sort_values("category_ix")
        np.testing.assert_array_equal(
            z["values"][row], sub.prob.to_numpy().astype(np.float32))
    # plain-VAE params mode: mean/log_variance arrays
    pz = tmp_path / "params.npz"
    encode_main("params", [str(plain_run / "checkpoint.pt"), str(toy),
                           str(toy / "ann.csv"), "11.0", "-S", str(pz),
                           "-b", "4", "--save_format", "npz"])
    zp = np.load(pz)
    assert zp["mean"].shape == zp["log_variance"].shape == (8, 6)


def test_probs_softmax_of_logits(abcd_run, toy, tmp_path):
    p_out, l_out = tmp_path / "p.csv", tmp_path / "l.csv"
    encode_main("probs", [str(abcd_run / "checkpoint.pt"), str(toy),
                          str(toy / "ann.csv"), "11.0", "-S", str(p_out)])
    encode_main("logits", [str(abcd_run / "checkpoint.pt"), str(toy),
                           str(toy / "ann.csv"), "11.0", "-S", str(l_out)])
    dp = pd.read_csv(p_out).pivot(index="data_ix", columns="category_ix",
                                  values="prob")
    dl = pd.read_csv(l_out).pivot(index="data_ix", columns="dimension",
                                  values="logit")
    ex = np.exp(dl.to_numpy())
    np.testing.assert_allclose(dp.to_numpy(), ex / ex.sum(-1, keepdims=True),
                               atol=1e-5)


def test_plain_training_and_encode(plain_run, toy, tmp_path):
    assert os.path.isfile(plain_run / "checkpoint.pt")
    out = tmp_path / "params.csv"
    encode_main("params", [str(plain_run / "checkpoint.pt"), str(toy),
                           str(toy / "ann.csv"), "11.0", "-S", str(out),
                           "-p", "mean,log_variance", "-b", "4"])
    df = pd.read_csv(out)
    assert list(df.columns[:4]) == ["data_ix", "parameter_name",
                                    "feature_dim", "parameter_value"]
    assert set(df.parameter_name.unique()) == {"mean", "log_variance"}
    assert len(df) == 8 * 2 * 6
    # sorted by (data_ix, parameter_name, feature_dim)
    key = df[["data_ix", "parameter_name", "feature_dim"]]
    assert key.equals(key.sort_values(["data_ix", "parameter_name",
                                       "feature_dim"]).reset_index(
        drop=True))
    assert "label" in df.columns


def test_resume_via_cli(abcd_run, toy):
    """Re-invoking the training CLI on the same save dir resumes."""
    learning_main("abcd", [str(toy), str(toy / "ann.csv"), "-S",
                           str(abcd_run.parent), "-j", "run-1", "-K", "4",
                           "-f", "6", "--pretrain_epochs", "1",
                           "--speaker_embed_dim", "4", "-e", "3", "-b", "4",
                           "--encoder_rnn_hidden_size", "8",
                           "--decoder_rnn_hidden_size", "8",
                           "--mlp_hidden_size", "8", "-N", "11.0"])
    log = open(abcd_run / "history.log").read()
    assert "LEARNING RETRIEVED." in log
    assert "To be restarted from the beginning of epoch #: 3" in log


def test_encode_link_model_adaptive_chunking():
    """The encode fetch-chunk re-targets to the drifting link: fast
    links grow the chunk (amortize the fixed RTT over more batches),
    slow links shrink it (keep the prefetch pipeline fine-grained);
    bounds [2, 256] hold; a fixed chunk never adapts."""
    from seq2seq_abcd_vae_tpu.infer.encode import _RTT_AMORT, _LinkModel

    per_batch = 256 * 1024  # 512x128 f32 probs

    # fast link: 30 ms RTT, ~200 MB/s -> chunk should grow well past 8
    m = _LinkModel(chunk=8, adaptive=True)
    for _ in range(4):
        nbytes = m.chunk * per_batch
        m.observe(0.03 + nbytes / 200e6, nbytes, m.chunk)
    assert m.chunk > 8
    # the model's own target: payload ~= _RTT_AMORT * rtt * bw
    assert m.chunk * per_batch == pytest.approx(
        _RTT_AMORT * m.rtt * m.bw, rel=0.5)

    # slow link: 0.5 s RTT floor already seen, ~1 MB/s -> chunk shrinks
    s = _LinkModel(chunk=64, adaptive=True)
    for _ in range(4):
        nbytes = s.chunk * per_batch
        s.observe(0.3 + nbytes / 1e6, nbytes, s.chunk)
    assert s.chunk < 64

    # bounds
    lo = _LinkModel(chunk=8, adaptive=True)
    lo.observe(10.0, 8, 8)  # absurdly slow tiny fetch
    assert lo.chunk >= 2
    hi = _LinkModel(chunk=8, adaptive=True)
    hi.observe(0.001, 8 * per_batch, 8)  # absurdly fast
    assert hi.chunk <= 256

    # fixed chunk: observe() is a no-op
    f = _LinkModel(chunk=32, adaptive=False)
    f.observe(0.03, 32 * per_batch, 32)
    assert f.chunk == 32


def test_encode_pipelined_small_chunk_yields_every_batch(abcd_run, toy):
    """_pipelined with a tiny fixed chunk (forcing multiple flushes)
    yields every batch exactly once, in order, with per-batch rows."""
    from seq2seq_abcd_vae_tpu.data.annotations import AnnotationParser
    from seq2seq_abcd_vae_tpu.data.batching import DataLoader, FrontendSpec
    from seq2seq_abcd_vae_tpu.infer.encode import Encoder

    enc = Encoder(str(abcd_run / "checkpoint.pt"))
    parser = AnnotationParser(str(toy), str(toy / "ann.csv"))
    ds = parser.get_data()
    fe = FrontendSpec(128, 64)
    statics = enc._statics(fe, 2.0 ** -15, 11.0)
    dl = DataLoader(ds, fe, batch_size=3, pad_to_batch_size=False)
    expected = [list(b.ixs) for b in DataLoader(
        ds, fe, batch_size=3, pad_to_batch_size=False)]
    seen = []
    for batch, values in enc._pipelined(dl, statics, "probs", chunk=2):
        assert values.shape[0] == batch.num_real
        seen.append(list(batch.ixs))
    assert seen == expected


def test_encode_csv_bytes_match_pandas_chain(abcd_run, toy, tmp_path):
    """The direct-writer CSV must be byte-identical to the reference's
    DataFrame.melt(+merge).to_csv formulation (encode.py:46-55)."""
    from seq2seq_abcd_vae_tpu.data.annotations import AnnotationParser
    from seq2seq_abcd_vae_tpu.data.batching import DataLoader, FrontendSpec
    from seq2seq_abcd_vae_tpu.infer.encode import Encoder

    enc = Encoder(str(abcd_run / "checkpoint.pt"))
    parser = AnnotationParser(str(toy), str(toy / "ann.csv"))
    ds = parser.get_data()
    fe = FrontendSpec(128, 64)
    fast = tmp_path / "fast.csv"
    enc.encode_dataset(ds, str(fast), fe, 2.0 ** -15, 11.0, mode="probs",
                       batch_size=3)

    # the pandas formulation, written independently here
    statics = enc._statics(fe, 2.0 ** -15, 11.0)
    dl = DataLoader(ds, fe, batch_size=3, pad_to_batch_size=False)
    df_ann = ds.df_annotation.drop(columns=["onset_ix", "offset_ix",
                                            "length"])
    slow = tmp_path / "slow.csv"
    for batch, values in enc._pipelined(dl, statics, "probs"):
        df = pd.DataFrame(values)
        df.loc[:, "data_ix"] = list(batch.ixs)
        df = df.melt(id_vars=["data_ix"], var_name="category_ix",
                     value_name="prob")
        df = df.merge(df_ann, how="left", left_on="data_ix",
                      right_index=True)
        if os.path.isfile(slow):
            df.to_csv(slow, index=False, mode="a", header=False)
        else:
            df.to_csv(slow, index=False)
    assert fast.read_bytes() == slow.read_bytes()


def test_encode_bf16_fetch_and_link_telemetry(abcd_run, toy, tmp_path,
                                              monkeypatch):
    """The opt-in SEQ2SEQ_ENCODE_FETCH_DTYPE=bf16 lever (tunnel-bytes
    compression, infer/encode.py::_dispatch) must keep probs within bf16
    rounding of the f32 contract path, and every pass must publish the
    link telemetry bench.py's ceiling computation reads."""
    from seq2seq_abcd_vae_tpu.data.annotations import AnnotationParser
    from seq2seq_abcd_vae_tpu.data.batching import DataLoader, FrontendSpec
    from seq2seq_abcd_vae_tpu.infer.encode import Encoder

    enc = Encoder(str(abcd_run / "checkpoint.pt"))
    parser = AnnotationParser(str(toy), str(toy / "ann.csv"))
    ds = parser.get_data()
    fe = FrontendSpec(128, 64)
    f32_csv, bf16_csv = tmp_path / "f32.csv", tmp_path / "bf16.csv"
    enc.encode_dataset(ds, str(f32_csv), fe, 2.0 ** -15, 11.0,
                       mode="probs", batch_size=3)
    stats = enc.last_encode_stats
    assert stats["flushes"] >= 1
    assert stats["fetched_bytes"] > 0
    assert stats["fetch_s"] > 0

    monkeypatch.setenv("SEQ2SEQ_ENCODE_FETCH_DTYPE", "bf16")
    enc.encode_dataset(ds, str(bf16_csv), fe, 2.0 ** -15, 11.0,
                       mode="probs", batch_size=3)
    a = pd.read_csv(f32_csv)
    b = pd.read_csv(bf16_csv)
    assert (a["data_ix"] == b["data_ix"]).all()
    np.testing.assert_allclose(b["prob"], a["prob"], rtol=8e-3, atol=1e-4)
    sums = b.groupby("data_ix")["prob"].sum()
    assert np.allclose(sums, 1.0, atol=0.02)

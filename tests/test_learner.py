"""Learner integration: toy training runs, loss decrease, checkpoint
resume, history.log contract (reference: ABCD-VAE/learning.py)."""

import os
import re

import numpy as np
import pandas as pd
import pytest
import scipy.io.wavfile as spw

from seq2seq_abcd_vae_tpu.data.annotations import AnnotationParser
from seq2seq_abcd_vae_tpu.data.batching import FrontendSpec
from seq2seq_abcd_vae_tpu.train.learner import Learner

FS = 16000


@pytest.fixture
def toy(tmp_path):
    rng = np.random.default_rng(11)
    # two "syllable types": chirps at different frequencies
    t = np.arange(int(4.0 * FS)) / FS
    wav = (np.sin(2 * np.pi * 2000 * t) * 8000
           + rng.normal(size=t.shape) * 300).astype(np.int16)
    spw.write(tmp_path / "x.wav", FS, wav)
    rows, cursor = [], 0.1
    for i in range(10):
        dur = 0.2 + 0.05 * (i % 3)
        dt = "valid" if i in (3, 7) else "train"
        rows.append(("x.wav", round(cursor, 3), round(cursor + dur, 3), dt,
                     "a" if i % 2 else "b", "A"))
        cursor += dur + 0.05
    df = pd.DataFrame(rows, columns=["input_path", "onset", "offset",
                                     "data_type", "speaker", "label"])
    df.to_csv(tmp_path / "ann.csv", index=False)
    return tmp_path


def small_learner(save_dir, latent_type="abcd", **kw):
    args = dict(
        input_size=65, encoder_rnn_hidden_size=16,
        decoder_rnn_hidden_size=16, mlp_hidden_size=16,
        save_dir=str(save_dir), latent_type=latent_type, seed=1111)
    if latent_type == "abcd":
        args.update(num_feature_categories=5, feature_dim=8)
    else:
        args.update(feature_size=8)
    args.update(kw)
    return Learner(**args)


def run_learn(learner, root, epochs, pretrain_epochs=0, **kw):
    parser = AnnotationParser(str(root), str(root / "ann.csv"))
    train = parser.get_data("train")
    valid = parser.get_data("valid")
    fe = FrontendSpec(128, 64)
    learner.learn(train, valid, epochs, batch_size_train=4,
                  batch_size_valid=4, frontend=fe, data_normalizer=11.0,
                  pretrain_epochs=pretrain_epochs, learning_rate=0.5,
                  momentum=0.0, gradient_clip=1.0, patience=0, **kw)


def read_epoch_losses(save_dir):
    txt = open(os.path.join(save_dir, "history.log")).read()
    return [float(m) for m in re.findall(
        r"mean training total loss \(per string\): *(-?[\d.]+)", txt)]


@pytest.mark.parametrize("latent_type", ["abcd", "gaussian"])
def test_training_decreases_loss(toy, tmp_path, latent_type):
    save = tmp_path / f"run-{latent_type}"
    save.mkdir()
    learner = small_learner(save, latent_type)
    run_learn(learner, toy, epochs=5,
              pretrain_epochs=2 if latent_type == "abcd" else 0)
    losses = read_epoch_losses(str(save))
    assert len(losses) == 5
    assert losses[-1] < losses[0], losses
    assert os.path.isfile(save / "checkpoint.pt")
    txt = open(save / "history.log").read()
    assert "START LEARNING." in txt
    assert "END OF TRAINING" in txt
    if latent_type == "abcd":
        assert "END OF PRETRAINING." in txt
        assert "Perplexity of the posterior clustering probs." in txt


def test_resume_continues_from_checkpoint(toy, tmp_path):
    save = tmp_path / "run-resume"
    save.mkdir()
    learner = small_learner(save)
    run_learn(learner, toy, epochs=3, pretrain_epochs=1)
    counts_before = learner.iter_counts
    assert counts_before > 0

    # new Learner detects history.log -> retrieval mode
    resumed = small_learner(save)
    assert resumed.retrieval
    assert resumed.last_epoch == 3
    assert resumed.iter_counts == counts_before
    # configs reconstructed from the self-describing checkpoint
    assert resumed.model_cfg.latent.num_categories == 5
    run_learn(resumed, toy, epochs=5, pretrain_epochs=1)
    txt = open(save / "history.log").read()
    assert "LEARNING RETRIEVED." in txt
    assert "To be restarted from the beginning of epoch #: 4" in txt
    losses = read_epoch_losses(str(save))
    assert len(losses) == 5  # 3 + 2 more


def test_resumed_params_match_saved(toy, tmp_path):
    save = tmp_path / "run-roundtrip"
    save.mkdir()
    learner = small_learner(save)
    run_learn(learner, toy, epochs=2)
    resumed = small_learner(save)
    for mod in ("encoder", "feature_sampler", "decoder"):
        a = learner.params[mod]
        b = resumed.params[mod]
        import jax
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_speaker_embedding_training(toy, tmp_path):
    save = tmp_path / "run-spk"
    save.mkdir()
    learner = small_learner(save, num_speakers=2, speaker_embed_dim=4)
    run_learn(learner, toy, epochs=2)
    assert "embed_speaker" in learner.params["decoder"]
    txt = open(save / "history.log").read()
    assert "# of speakers: 2" in txt


def test_scheduler_wiring_matches_logged_losses(toy, tmp_path):
    """The logged per-epoch lr sequence must be exactly what a torch-parity
    ReduceLROnPlateau(patience=0) produces when driven by the logged mean
    validation losses — verifying learn()'s scheduler wiring without
    depending on how the losses themselves evolve."""
    from seq2seq_abcd_vae_tpu.train.optim import ReduceLROnPlateau
    save = tmp_path / "run-lr"
    save.mkdir()
    learner = small_learner(save, latent_type="gaussian")
    parser = AnnotationParser(str(toy), str(toy / "ann.csv"))
    fe = FrontendSpec(128, 64)
    learner.learn(parser.get_data("train"), parser.get_data("valid"), 5,
                  batch_size_train=4, batch_size_valid=4, frontend=fe,
                  data_normalizer=11.0, learning_rate=1e-7, momentum=0.0,
                  gradient_clip=1.0, patience=0)
    txt = open(save / "history.log").read()
    lrs = [float(m) for m in re.findall(r"current learning rate: ([\de.+-]+)",
                                        txt)]
    vlosses = [float(m) for m in re.findall(
        r"mean validation total loss \(per string\): *(-?[\d.]+)", txt)]
    assert len(lrs) == len(vlosses) == 5
    sched = ReduceLROnPlateau(patience=0)
    lr = 1e-7
    for i, v in enumerate(vlosses):
        assert lrs[i] == pytest.approx(lr, rel=1e-4), f"epoch {i + 1}"
        lr = sched.step(v, lr)
    from seq2seq_abcd_vae_tpu.train import optim as optim_mod
    assert optim_mod.get_learning_rate(learner.opt_state) == pytest.approx(
        lr, rel=1e-4)

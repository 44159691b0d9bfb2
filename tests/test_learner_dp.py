"""End-to-end Learner training over a data-parallel mesh (virtual CPU
devices), exercising the num_data_partitions path the CLI exposes."""

import re

import numpy as np
import pandas as pd
import pytest
import scipy.io.wavfile as spw

import jax

from seq2seq_abcd_vae_tpu.data.annotations import AnnotationParser
from seq2seq_abcd_vae_tpu.data.batching import FrontendSpec
from seq2seq_abcd_vae_tpu.train.learner import Learner

FS = 16000


@pytest.fixture
def toy(tmp_path):
    rng = np.random.default_rng(4)
    wav = (rng.normal(size=int(2.2 * FS)) * 4000).astype(np.int16)
    spw.write(tmp_path / "x.wav", FS, wav)
    rows, cursor = [], 0.05
    for i in range(8):
        dur = 0.16 + 0.04 * (i % 2)
        dt = "valid" if i in (3, 6) else "train"
        rows.append(("x.wav", round(cursor, 3), round(cursor + dur, 3), dt))
        cursor += dur + 0.03
    pd.DataFrame(rows, columns=["input_path", "onset", "offset",
                                "data_type"]).to_csv(tmp_path / "ann.csv",
                                                     index=False)
    return tmp_path


def test_learner_trains_on_mesh(toy, tmp_path):
    save = tmp_path / "dp"
    save.mkdir()
    learner = Learner(
        input_size=65, encoder_rnn_hidden_size=8, decoder_rnn_hidden_size=8,
        mlp_hidden_size=8, num_feature_categories=4, feature_dim=4,
        save_dir=str(save), latent_type="abcd", seed=1,
        num_data_partitions=4)
    assert learner.mesh is not None and learner.mesh.size == 4
    parser = AnnotationParser(str(toy), str(toy / "ann.csv"))
    fe = FrontendSpec(128, 64)
    learner.learn(parser.get_data("train"), parser.get_data("valid"), 2,
                  batch_size_train=4, batch_size_valid=4, frontend=fe,
                  data_normalizer=11.0, learning_rate=0.1, momentum=0.0,
                  gradient_clip=1.0, patience=0)
    txt = open(save / "history.log").read()
    assert "Data-parallel mesh over 4 devices." in txt
    losses = [float(m) for m in re.findall(
        r"mean training total loss \(per string\): *(-?[\d.]+)", txt)]
    assert len(losses) == 2 and all(np.isfinite(losses))
    # params replicated across the mesh
    leaf = jax.tree_util.tree_leaves(learner.params)[0]
    assert len(leaf.sharding.device_set) == 4

"""Export-to-torch checkpoints (the inverse of torch_import).

Round-trip guarantees: reference-format -> import -> export reproduces
the original tensors bit-for-bit, and our-format -> export -> import
reproduces our parameter trees; torch itself can consume the exported
state dicts (load_state_dict into freshly built torch modules).
"""

import numpy as np
import pytest
import torch

from seq2seq_abcd_vae_tpu.train import torch_export as te
from seq2seq_abcd_vae_tpu.train import torch_import as ti

from test_torch_import import _full_torch_checkpoint


def test_import_export_is_identity(rng):
    torch_ckpt = _full_torch_checkpoint(rng)
    payload = ti.import_torch_checkpoint(torch_ckpt)
    out = te.export_torch_checkpoint(payload, learning_rate=0.25)

    for module in ("encoder", "feature_sampler", "decoder"):
        orig = {k: np.asarray(v) for k, v in torch_ckpt[module].items()}
        got = {k: np.asarray(v) for k, v in out[module].items()}
        extra = set(got) - set(orig)
        # export adds the prior_concentration buffer the reference
        # registers but _full_torch_checkpoint omits
        assert extra <= {"prior_concentration"}
        for k in orig:
            np.testing.assert_array_equal(got[k], orig[k], err_msg=k)
        assert (out[f"{module}_init_parameters"]
                == torch_ckpt[f"{module}_init_parameters"])
    assert out["epoch"] == 7
    assert out["gradient_clip"] == 0.5
    assert out["optimizer"]["param_groups"][0]["lr"] == 0.25
    n = out["optimizer"]["param_groups"][0]["params"]
    # 8 enc + 6 sampler (buffer excluded) + 18 dec tensors
    # (f2h 2, offset MLP 4, 2 emission MLPs 8, cell 4)
    assert len(n) == 8 + 6 + 18


def test_exported_state_dicts_load_into_torch_modules(rng):
    """torch.nn modules accept the exported tensors under strict=True
    (shapes, dtypes, and key names all reference-exact)."""
    torch_ckpt = _full_torch_checkpoint(rng)
    payload = ti.import_torch_checkpoint(torch_ckpt)
    out = te.export_torch_checkpoint(payload)

    rnn = torch.nn.LSTM(9, 11, 1, bidirectional=True, batch_first=True)
    rnn.load_state_dict({k[len("rnn."):]: v
                         for k, v in out["encoder"].items()}, strict=True)
    cell = torch.nn.LSTMCell(9, 11)
    cell.load_state_dict(
        {k[len("rnn_cell.cell."):]: v for k, v in out["decoder"].items()
         if k.startswith("rnn_cell.cell.")}, strict=True)
    f2h = torch.nn.Linear(6, 22)
    f2h.load_state_dict(
        {k[len("feature2hidden."):]: v for k, v in out["decoder"].items()
         if k.startswith("feature2hidden.")}, strict=True)


def test_export_then_import_roundtrips_our_params(tmp_path):
    """Train 1 tiny epoch, export, re-import: parameter trees identical."""
    import pandas as pd
    import scipy.io.wavfile as spw

    from seq2seq_abcd_vae_tpu.cli.learning_main import main as learn_main
    from seq2seq_abcd_vae_tpu.train import checkpoint as ckpt

    fs = 16000
    root = tmp_path / "toy"
    root.mkdir()
    g = np.random.default_rng(3)
    spw.write(root / "x.wav", fs,
              (g.normal(size=int(1.2 * fs)) * 3000).astype(np.int16))
    rows, cursor = [], 0.05
    for i in range(5):
        dt = "valid" if i == 4 else "train"
        rows.append(("x.wav", round(cursor, 3), round(cursor + 0.15, 3), dt,
                     "s%d" % (i % 2)))
        cursor += 0.18
    pd.DataFrame(rows, columns=["input_path", "onset", "offset", "data_type",
                                "speaker"]).to_csv(root / "ann.csv",
                                                   index=False)
    learn_main("abcd", [str(root), str(root / "ann.csv"), "-S",
                        str(tmp_path), "-j", "r", "-e", "1", "-b", "4",
                        "--encoder_rnn_hidden_size", "8",
                        "--decoder_rnn_hidden_size", "8",
                        "--mlp_hidden_size", "8", "-K", "3", "-f", "4",
                        "--speaker_embed_dim", "3",
                        "--pretrain_epochs", "0", "-N", "11.0"])
    payload = ckpt.load_checkpoint(str(tmp_path / "r" / "checkpoint.pt"))
    exported = te.export_torch_checkpoint(payload)
    back = ti.import_torch_checkpoint(exported)

    import jax
    for module in ("encoder", "feature_sampler", "decoder"):
        a = jax.tree_util.tree_leaves(payload[module])
        b = jax.tree_util.tree_leaves(back[module])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x, np.float32),
                                       np.asarray(y), rtol=0, atol=0)
    assert (back["feature_sampler_init_parameters"]
            == payload["feature_sampler_init_parameters"])
    assert exported["decoder_init_parameters"]["num_speakers"] == 2
    assert "embed_speaker.weight" in exported["decoder"]

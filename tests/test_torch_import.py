"""Importing reference-format (PyTorch) checkpoints.

Reference checkpoints are self-describing dicts of module state_dicts +
init-parameter dicts (ABCD-VAE/learning.py:298-312).  These tests build
state dicts with the reference's exact key names and verify the imported
parameters reproduce torch's computations.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from seq2seq_abcd_vae_tpu.configs import (ABCDSamplerConfig, DecoderConfig,
                                          EncoderConfig)
from seq2seq_abcd_vae_tpu.models import abcd as abcd_mod
from seq2seq_abcd_vae_tpu.models import encoder as enc_mod
from seq2seq_abcd_vae_tpu.models import mlp as mlp_mod
from seq2seq_abcd_vae_tpu.train import torch_import as ti


def make_torch_lstm_state(in_size, hidden, bidirectional=True):
    rnn = torch.nn.LSTM(in_size, hidden, 1, bidirectional=bidirectional,
                        batch_first=True)
    state = {f"rnn.{k}": v for k, v in rnn.state_dict().items()}
    return rnn, state


def make_torch_mlp_state(prefix, in_size, hid, out):
    mlp = torch.nn.Sequential(torch.nn.Linear(in_size, hid), torch.nn.Tanh(),
                              torch.nn.Linear(hid, out))
    state = {f"{prefix}.whole_network.{k}": v
             for k, v in mlp.state_dict().items()}
    return mlp, state


def test_import_encoder_matches_torch(rng):
    cfg = EncoderConfig(13, 17)
    t_rnn, state = make_torch_lstm_state(13, 17)
    params = ti.import_encoder(state, cfg)
    lengths = np.asarray([9, 5], np.int32)
    x = rng.normal(size=(2, 9, 13)).astype(np.float32)
    x[1, 5:] = 0
    ours = np.asarray(enc_mod.encoder_apply(params, cfg, jnp.asarray(x),
                                            jnp.asarray(lengths)))
    with torch.no_grad():
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), torch.from_numpy(lengths.astype(np.int64)),
            batch_first=True)
        _, last = t_rnn(packed)
        theirs = torch.cat(last, -1).transpose(0, 1).reshape(2, -1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_import_gru_encoder_matches_torch(rng):
    cfg = EncoderConfig(7, 11, rnn_type="GRU")
    rnn = torch.nn.GRU(7, 11, 1, bidirectional=True, batch_first=True)
    state = {f"rnn.{k}": v for k, v in rnn.state_dict().items()}
    params = ti.import_encoder(state, cfg)
    lengths = np.asarray([6, 4], np.int32)
    x = rng.normal(size=(2, 6, 7)).astype(np.float32)
    ours = np.asarray(enc_mod.encoder_apply(params, cfg, jnp.asarray(x),
                                            jnp.asarray(lengths)))
    with torch.no_grad():
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), torch.from_numpy(lengths.astype(np.int64)),
            batch_first=True)
        _, last = rnn(packed)
        theirs = last.transpose(0, 1).reshape(2, -1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_import_bidirectional_decoder(rng):
    """Bidirectional decoder import: reverse cells/heads map and the
    imported model decodes finite losses."""
    from seq2seq_abcd_vae_tpu.configs import DecoderConfig
    from seq2seq_abcd_vae_tpu.models import decoder as dec_mod
    in_size, hid, mlp_h, f_dim = 6, 9, 5, 4
    state = {}
    for suffix in ("", "_reverse"):
        cell = torch.nn.LSTMCell(in_size, hid)
        state.update({f"rnn_cell{suffix}.cell.{k}": v
                      for k, v in cell.state_dict().items()})
        for i in range(2):
            _, s = make_torch_mlp_state(
                f"emission_sampler{suffix}.to_parameters.mlps.{i}", hid,
                mlp_h, in_size)
            state.update(s)
        _, s = make_torch_mlp_state(f"offset_predictor{suffix}", hid,
                                    mlp_h, 1)
        state.update(s)
    f2h = torch.nn.Linear(f_dim, hid * 4)  # 2H (LSTM) x 2 (bidir)
    state.update({f"feature2hidden.{k}": v
                  for k, v in f2h.state_dict().items()})
    cfg = DecoderConfig(in_size, hid, mlp_h, f_dim, bidirectional=True,
                        right2left_weight=0.3)
    params = ti.import_decoder(state, cfg)
    assert "rnn_cell_reverse" in params
    feats = jnp.asarray(rng.normal(size=(2, f_dim)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(2, 5, in_size)).astype(np.float32))
    off = jnp.zeros((2, 5))
    out = dec_mod.decoder_apply(
        params, cfg, feats, jnp.asarray([5, 3], jnp.int32), 5,
        ground_truth_out=gt, ground_truth_offset=off,
        key=jax.random.PRNGKey(0), deterministic=True)
    assert np.isfinite(float(out.emission_loss))
    assert np.isfinite(float(out.offset_loss))


def test_import_abcd_head_matches_torch(rng):
    cfg = ABCDSamplerConfig(10, 8, 5, 6)
    t_mlp, state = make_torch_mlp_state("to_code_like", 10, 8, 6)
    state["posterior_shape_logits"] = torch.randn(5)
    state["codebook"] = torch.randn(6, 5)
    params = ti.import_abcd(state, cfg)
    x = rng.normal(size=(4, 10)).astype(np.float32)
    ours = np.asarray(abcd_mod.abcd_logits(params, jnp.asarray(x)))
    with torch.no_grad():
        code = t_mlp(torch.from_numpy(x))
        theirs = (code @ state["codebook"] / np.sqrt(6.0)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def _full_torch_checkpoint(rng):
    """Reference-shaped checkpoint for an abcd model (LSTM enc/dec)."""
    in_size, hid, mlp_h, k_cat, f_dim = 9, 11, 7, 5, 6
    _, enc_state = make_torch_lstm_state(in_size, hid)
    enc_state = {k: v for k, v in enc_state.items()}

    _, code_state = make_torch_mlp_state("to_code_like", hid * 4, mlp_h,
                                         f_dim)
    sampler_state = dict(code_state)
    sampler_state["posterior_shape_logits"] = torch.randn(k_cat)
    sampler_state["codebook"] = torch.randn(f_dim, k_cat)

    dec_state = {}
    cell = torch.nn.LSTMCell(in_size, hid)
    dec_state.update({f"rnn_cell.cell.{k}": v
                      for k, v in cell.state_dict().items()})
    f2h = torch.nn.Linear(f_dim, hid * 2)
    dec_state.update({f"feature2hidden.{k}": v
                      for k, v in f2h.state_dict().items()})
    for i in range(2):
        _, s = make_torch_mlp_state(
            f"emission_sampler.to_parameters.mlps.{i}", hid, mlp_h, in_size)
        dec_state.update(s)
    _, s = make_torch_mlp_state("offset_predictor", hid, mlp_h, 1)
    dec_state.update(s)

    return {
        "epoch": 7,
        "encoder": enc_state,
        "encoder_init_parameters": {
            "input_size": in_size, "rnn_hidden_size": hid,
            "rnn_type": "LSTM", "rnn_layers": 1, "hidden_dropout": 0.0,
            "bidirectional": True},
        "feature_sampler": sampler_state,
        "feature_sampler_init_parameters": {
            "input_size": hid * 4, "mlp_hidden_size": mlp_h,
            "num_categories": k_cat, "feature_dim": f_dim,
            "prior_concentration": 1.0, "min_temperature": 1.0,
            "epoch_init_iter_counts": 123, "temperature_update_freq": 1000,
            "temperature_anneal_rate": 1e-5},
        "decoder": dec_state,
        "decoder_init_parameters": {
            "output_size": in_size, "rnn_hidden_size": hid,
            "mlp_hidden_size": mlp_h, "feature_size": f_dim,
            "emission_distr_name": "isotropic_gaussian",
            "rnn_type": "LSTM", "rnn_layers": 1, "input_dropout": 0.0,
            "bidirectional": False},
        "gradient_clip": 0.5,
    }


def test_full_checkpoint_roundtrip_through_encoder_cli(tmp_path, rng):
    """Imported checkpoint loads in the inference Encoder and the anneal
    counter / gradient clip carry over."""
    torch_ckpt = _full_torch_checkpoint(rng)
    payload = ti.import_torch_checkpoint(torch_ckpt)
    assert payload["latent_type"] == "abcd"
    assert payload["gradient_clip"] == 0.5
    assert (payload["feature_sampler_init_parameters"]
            ["epoch_init_iter_counts"] == 123)

    from seq2seq_abcd_vae_tpu.train import checkpoint as ckpt
    path = ckpt.save_checkpoint(str(tmp_path), payload)

    from seq2seq_abcd_vae_tpu.infer.encode import Encoder
    enc = Encoder(path, device="cpu")
    assert enc.model_cfg.latent.num_categories == 5
    assert enc.iter_counts == 123
    # forward runs
    from seq2seq_abcd_vae_tpu.models import encoder as em
    x = jnp.asarray(rng.normal(size=(2, 6, 9)).astype(np.float32))
    h = em.encoder_apply(enc.params["encoder"], enc.model_cfg.encoder, x,
                         jnp.asarray([6, 4], jnp.int32))
    logits = abcd_mod.abcd_logits(enc.params["feature_sampler"], h)
    assert logits.shape == (2, 5)
    assert np.isfinite(np.asarray(logits)).all()

"""Encoder parity vs torch packed-sequence RNNs (the reference's encoder
compute path, ABCD-VAE/modules/model.py:53,60-66)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from seq2seq_abcd_vae_tpu.configs import EncoderConfig
from seq2seq_abcd_vae_tpu.models import encoder as enc


def copy_params_to_torch(params, t_rnn, bidirectional):
    for l, layer in enumerate(params["layers"]):
        pairs = [("", "fwd")] + ([("_reverse", "bwd")] if bidirectional else [])
        for suffix, ours in pairs:
            p = layer[ours]
            getattr(t_rnn, f"weight_ih_l{l}{suffix}").data = torch.from_numpy(
                np.asarray(p["w_ih"]).T.copy())
            getattr(t_rnn, f"weight_hh_l{l}{suffix}").data = torch.from_numpy(
                np.asarray(p["w_hh"]).T.copy())
            getattr(t_rnn, f"bias_ih_l{l}{suffix}").data = torch.from_numpy(
                np.asarray(p["b_ih"]).copy())
            getattr(t_rnn, f"bias_hh_l{l}{suffix}").data = torch.from_numpy(
                np.asarray(p["b_hh"]).copy())


@pytest.mark.parametrize("rnn_type", ["LSTM", "GRU", "RNN"])
@pytest.mark.parametrize("bidirectional", [True, False])
@pytest.mark.parametrize("layers", [1, 2])
def test_encoder_matches_torch_packed(rng, rnn_type, bidirectional, layers):
    in_size, hidden = 13, 17
    lengths = np.array([9, 7, 7, 3], dtype=np.int32)  # sorted desc
    b, t = len(lengths), int(lengths.max())
    cfg = EncoderConfig(in_size, hidden, rnn_type=rnn_type,
                        rnn_layers=layers, bidirectional=bidirectional)
    params = enc.encoder_init(jax.random.PRNGKey(0), cfg)

    x = rng.normal(size=(b, t, in_size)).astype(np.float32)
    for i, l in enumerate(lengths):
        x[i, l:] = 0.0

    ours = np.asarray(enc.encoder_apply(params, cfg, jnp.asarray(x),
                                        jnp.asarray(lengths)))

    t_rnn = getattr(torch.nn, rnn_type)(in_size, hidden, layers,
                                        bidirectional=bidirectional,
                                        batch_first=True)
    with torch.no_grad():
        copy_params_to_torch(params, t_rnn, bidirectional)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), torch.from_numpy(lengths.astype(np.int64)),
            batch_first=True)
        _, last = t_rnn(packed)
        if rnn_type == "LSTM":
            last = torch.cat(last, dim=-1)
        theirs = last.transpose(0, 1).contiguous().view(b, -1).numpy()

    assert ours.shape == theirs.shape == (b, cfg.hidden_size_total)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_zero_length_row_yields_zero_state(rng):
    cfg = EncoderConfig(5, 8)
    params = enc.encoder_init(jax.random.PRNGKey(1), cfg)
    x = rng.normal(size=(3, 6, 5)).astype(np.float32)
    lengths = jnp.asarray([6, 4, 0], dtype=jnp.int32)
    out = np.asarray(enc.encoder_apply(params, cfg, jnp.asarray(x), lengths))
    np.testing.assert_array_equal(out[2], np.zeros_like(out[2]))


def test_padding_invariance(rng):
    """Extending T with padding must not change any encoder output."""
    cfg = EncoderConfig(5, 8, rnn_type="LSTM", bidirectional=True)
    params = enc.encoder_init(jax.random.PRNGKey(2), cfg)
    x = rng.normal(size=(2, 6, 5)).astype(np.float32)
    lengths = jnp.asarray([6, 4], dtype=jnp.int32)
    out1 = np.asarray(enc.encoder_apply(params, cfg, jnp.asarray(x), lengths))
    x_pad = np.concatenate([x, np.zeros((2, 5, 5), np.float32)], axis=1)
    out2 = np.asarray(enc.encoder_apply(params, cfg, jnp.asarray(x_pad),
                                        lengths))
    np.testing.assert_allclose(out1, out2, rtol=1e-6, atol=1e-6)


def test_esn_encoder_shapes_and_masking(rng):
    cfg = EncoderConfig(5, 16, rnn_type="ESN", bidirectional=True,
                        esn_leak=0.7)
    params = enc.encoder_init(jax.random.PRNGKey(3), cfg)
    x = rng.normal(size=(3, 7, 5)).astype(np.float32)
    lengths = jnp.asarray([7, 5, 0], dtype=jnp.int32)
    out = np.asarray(enc.encoder_apply(params, cfg, jnp.asarray(x), lengths))
    assert out.shape == (3, cfg.hidden_size_total)
    assert cfg.hidden_size_total == 32  # no LSTM doubling
    np.testing.assert_array_equal(out[2], 0.0)
    # padding invariance for ESN too
    x_pad = np.concatenate([x, np.zeros((3, 4, 5), np.float32)], axis=1)
    out2 = np.asarray(enc.encoder_apply(params, cfg, jnp.asarray(x_pad),
                                        lengths))
    np.testing.assert_allclose(out, out2, rtol=1e-6, atol=1e-6)


def test_esn_spectral_radius():
    from seq2seq_abcd_vae_tpu.models import esn as esn_mod
    w = esn_mod._hidden_weight(jax.random.PRNGKey(0), 64, 0.1)
    radius = np.abs(np.linalg.eigvals(np.asarray(w))).max()
    np.testing.assert_allclose(radius, 0.99, rtol=1e-5)
    # sparsity ~10% kept
    frac = (np.asarray(w) != 0).mean()
    assert 0.05 < frac < 0.2


def test_esn_input_weight_values():
    from scipy import stats as spstats
    from seq2seq_abcd_vae_tpu.models import esn as esn_mod
    w = np.asarray(esn_mod._input_weight(jax.random.PRNGKey(0), 65, 32, 0.95))
    q = float(spstats.binom.ppf(0.95, 65, 0.5))
    vals = np.unique(w)
    np.testing.assert_allclose(sorted(vals), [-3.0 / q, 3.0 / q], rtol=1e-6)


def test_esn_weights_frozen(rng):
    """ESN reservoir weights are non-trainable (reference model.py:376,396
    requires_grad=False): gradients through the encoder must be EXACTLY
    zero for w_ih/w_hh while still flowing to the input (a lower layer's
    trainable output in stacked configs)."""
    cfg = EncoderConfig(5, 16, rnn_type="ESN", bidirectional=True,
                        esn_leak=0.7, rnn_layers=2)
    params = enc.encoder_init(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(rng.normal(size=(3, 7, 5)).astype(np.float32))
    lengths = jnp.asarray([7, 5, 2], dtype=jnp.int32)

    def loss(p, xx):
        out = enc.encoder_apply(p, cfg, xx, lengths)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params, x)
    for layer in g["layers"]:
        for d in layer.values():
            np.testing.assert_array_equal(np.asarray(d["w_ih"]), 0.0)
            np.testing.assert_array_equal(np.asarray(d["w_hh"]), 0.0)
    gx = jax.grad(loss, argnums=1)(params, x)
    assert float(jnp.linalg.norm(gx)) > 0.0

"""Variational sequence encoder: masked scan RNN/ESN over padded batches.

Reference: RNN_Variational_Encoder, ABCD-VAE/modules/model.py:40-79.
Output is the flattened final hidden state; for LSTM both h and c are
concatenated per (layer, direction) so the total width is
layers * hidden * (2 if bidir) * (2 if LSTM)  (model.py:54-66).  The
flattening order matches torch: (B, layer*dirs, [h|c]) row-major.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import EncoderConfig
from . import esn as esn_mod
from . import initializers as init
from . import rnn as rnn_mod


def encoder_init(key: jax.Array, cfg: EncoderConfig) -> dict:
    if cfg.rnn_type == "ESN":
        return esn_mod.esn_init(key, cfg.input_size, cfg.rnn_hidden_size,
                                cfg.rnn_layers, cfg.bidirectional)
    num_gates = rnn_mod.NUM_GATES[cfg.rnn_type]
    dirs = 2 if cfg.bidirectional else 1
    layers = []
    for l in range(cfg.rnn_layers):
        in_size = cfg.input_size if l == 0 else cfg.rnn_hidden_size * dirs
        key, kf, kb = jax.random.split(key, 3)
        entry = {"fwd": init.rnn_gate_params(kf, in_size, cfg.rnn_hidden_size,
                                             num_gates)}
        if cfg.bidirectional:
            entry["bwd"] = init.rnn_gate_params(kb, in_size,
                                                cfg.rnn_hidden_size, num_gates)
        layers.append(entry)
    return {"layers": layers}


def encoder_apply(params: dict, cfg: EncoderConfig, x: jax.Array,
                  lengths: jax.Array, *, dropout_key: jax.Array | None = None,
                  deterministic: bool = True) -> jax.Array:
    """(B, T, F) padded inputs + (B,) lengths -> (B, hidden_size_total).

    Rows with length 0 (batch padding) yield the zero initial state.
    """
    mask = rnn_mod.lengths_to_mask(lengths, x.shape[1], x.dtype)
    if cfg.rnn_type == "ESN":
        return _esn_forward(params, cfg, x, mask, dropout_key, deterministic)
    return _rnn_forward(params, cfg, x, mask, dropout_key, deterministic)


def _interlayer_dropout(y, rate, key, deterministic):
    """torch inter-layer RNN dropout (outputs of all but the last layer)."""
    if deterministic or rate <= 0.0:
        return y
    keep = jax.random.bernoulli(key, 1.0 - rate, y.shape)
    return jnp.where(keep, y / (1.0 - rate), 0.0)


def _rnn_forward(params, cfg, x, mask, dropout_key, deterministic):
    finals = []  # per (layer, dir): h or (h, c)
    y = x
    for l, layer in enumerate(params["layers"]):
        if cfg.bidirectional:
            outs_f, outs_b, both = rnn_mod.run_rnn_layer_bidir(
                cfg.rnn_type, layer["fwd"], layer["bwd"], y, mask)
            finals.extend(both)
            y = jnp.concatenate([outs_f, outs_b], axis=-1)
        else:
            outs_f, (h_f, c_f) = rnn_mod.run_rnn_layer(
                cfg.rnn_type, layer["fwd"], y, mask)
            finals.append((h_f, c_f))
            y = outs_f
        if l < cfg.rnn_layers - 1:
            sub = (None if dropout_key is None
                   else jax.random.fold_in(dropout_key, l))
            y = _interlayer_dropout(y, cfg.hidden_dropout, sub, deterministic
                                    or dropout_key is None)
    return _flatten_final(cfg, finals)


def _esn_forward(params, cfg, x, mask, dropout_key, deterministic):
    finals = []
    y = x
    for l, layer in enumerate(params["layers"]):
        if cfg.bidirectional:
            outs_f, outs_b, h_f, h_b = esn_mod.run_esn_layer_bidir(
                layer["fwd"], layer["bwd"], y, mask, cfg.esn_leak)
            finals.append((h_f, None))
            finals.append((h_b, None))
            y = jnp.concatenate([outs_f, outs_b], axis=-1)
        else:
            outs_f, h_f = esn_mod.run_esn_layer(layer["fwd"], y, mask,
                                                cfg.esn_leak)
            finals.append((h_f, None))
            y = outs_f
        if l < cfg.rnn_layers - 1:
            sub = (None if dropout_key is None
                   else jax.random.fold_in(dropout_key, l))
            y = _interlayer_dropout(y, cfg.hidden_dropout, sub, deterministic
                                    or dropout_key is None)
    return _flatten_final(cfg, finals)


def _flatten_final(cfg: EncoderConfig, finals) -> jax.Array:
    """Concatenate per-(layer,dir) final states in torch order
    (model.py:62-66): LSTM states become [h | c] along the feature axis,
    then all (layer, dir) blocks are flattened row-major."""
    blocks = []
    for h, c in finals:
        if cfg.rnn_type == "LSTM":
            blocks.append(jnp.concatenate([h, c], axis=-1))
        else:
            blocks.append(h)
    stacked = jnp.stack(blocks, axis=1)  # (B, layers*dirs, width)
    return stacked.reshape(stacked.shape[0], -1)

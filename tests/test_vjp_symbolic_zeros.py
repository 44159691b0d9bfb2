"""Final-state-only gradients through the layer kernels (symbolic-zero
outs cotangents — ops/_vjp_utils.py).

The encoder consumes only the last layer's final states, so the per-step
outputs' cotangent is a symbolic zero there; the kernels' backward must
(a) take the dead-cotangent fast path without materializing a (T,.,B,H)
zeros tensor and (b) still produce scan-identical gradients."""

import numpy as np

import jax
import jax.numpy as jnp

from seq2seq_abcd_vae_tpu.models import encoder as enc_mod
from seq2seq_abcd_vae_tpu.models import initializers as init
from seq2seq_abcd_vae_tpu.models import rnn as rnn_mod
from seq2seq_abcd_vae_tpu.configs import EncoderConfig


def _grad_uni(rnn_type, gates, backend, x, monkeypatch):
    from seq2seq_abcd_vae_tpu.utils.backend_select import SELECTOR

    params = init.rnn_gate_params(jax.random.PRNGKey(0), 5, 8, gates)
    mask = rnn_mod.lengths_to_mask(jnp.asarray([7, 5, 3, 1]), 7)

    def loss(p, xx):
        # outs deliberately unused: only the final states contribute
        _, (h_n, c_n) = rnn_mod.run_rnn_layer(rnn_type, p, xx, mask)
        return jnp.sum(h_n * h_n) + jnp.sum(jnp.tanh(c_n))

    monkeypatch.setenv("SEQ2SEQ_RNN_BACKEND", backend)
    SELECTOR.reset()
    try:
        return jax.grad(loss, argnums=(0, 1))(params, x)
    finally:
        monkeypatch.delenv("SEQ2SEQ_RNN_BACKEND")
        SELECTOR.reset()


def test_final_state_only_grads_uni(rng, monkeypatch):
    x = jnp.asarray(rng.normal(size=(4, 7, 5)).astype(np.float32))
    for rnn_type, gates in (("LSTM", 4), ("GRU", 3), ("RNN", 1)):
        g_s = _grad_uni(rnn_type, gates, "scan", x, monkeypatch)
        g_p = _grad_uni(rnn_type, gates, "pallas", x, monkeypatch)
        for a, b in zip(jax.tree_util.tree_leaves(g_s),
                        jax.tree_util.tree_leaves(g_p)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-4, atol=1e-5,
                                       err_msg=rnn_type)


def test_final_state_only_grads_through_encoder(rng, monkeypatch):
    """Whole single-layer bidirectional encoder: outs of the (only)
    layer are dead, the flattened final state feeds the loss — the
    exact shape of the publication config's backward."""
    from seq2seq_abcd_vae_tpu.utils.backend_select import SELECTOR

    for rnn_type in ("LSTM", "GRU", "RNN"):
        cfg = EncoderConfig(5, 8, rnn_type=rnn_type, bidirectional=True)
        params = enc_mod.encoder_init(jax.random.PRNGKey(1), cfg)
        x = jnp.asarray(rng.normal(size=(4, 7, 5)).astype(np.float32))
        lengths = jnp.asarray([7, 5, 3, 1])

        def loss(p, xx):
            h = enc_mod.encoder_apply(p, cfg, xx, lengths)
            return jnp.sum(h * jnp.tanh(h))

        grads = {}
        for backend in ("scan", "pallas"):
            monkeypatch.setenv("SEQ2SEQ_RNN_BACKEND", backend)
            monkeypatch.setenv("SEQ2SEQ_ENCODER_BACKEND", backend)
            SELECTOR.reset()
            try:
                grads[backend] = jax.grad(loss, argnums=(0, 1))(params, x)
            finally:
                monkeypatch.delenv("SEQ2SEQ_RNN_BACKEND")
                monkeypatch.delenv("SEQ2SEQ_ENCODER_BACKEND")
                SELECTOR.reset()
        for a, b in zip(jax.tree_util.tree_leaves(grads["scan"]),
                        jax.tree_util.tree_leaves(grads["pallas"])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-4, atol=1e-5,
                                       err_msg=rnn_type)


def test_symbolic_zero_path_taken(rng, monkeypatch):
    """The dead-outs backward must not contain a (T, 2, B, H) zeros
    broadcast: check the optimized HLO of the encoder grad for the
    full-size douts constant."""
    from seq2seq_abcd_vae_tpu.utils.backend_select import SELECTOR

    cfg = EncoderConfig(5, 8, rnn_type="LSTM", bidirectional=True)
    params = enc_mod.encoder_init(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.normal(size=(4, 9, 5)).astype(np.float32))
    lengths = jnp.asarray([9, 5, 3, 1])

    def loss(p):
        h = enc_mod.encoder_apply(p, cfg, x, lengths)
        return jnp.sum(h * h)

    monkeypatch.setenv("SEQ2SEQ_RNN_BACKEND", "pallas")
    monkeypatch.setenv("SEQ2SEQ_ENCODER_BACKEND", "pallas")
    SELECTOR.reset()
    try:
        jaxpr = jax.make_jaxpr(jax.grad(loss))(params)
    finally:
        monkeypatch.delenv("SEQ2SEQ_RNN_BACKEND")
        monkeypatch.delenv("SEQ2SEQ_ENCODER_BACKEND")
        SELECTOR.reset()
    # the dead-cotangent fast path substitutes a (1, 2, B, H) resident
    # zero block for douts; a materialized (T, 2, B, H) zeros stream
    # would make this block absent from the backward pallas_call
    assert "f32[1,2,4,8]" in str(jaxpr)

"""Fused Pallas GRU layer kernels: forward and gradient parity with the
lax.scan path (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from seq2seq_abcd_vae_tpu.models import initializers as init
from seq2seq_abcd_vae_tpu.models import rnn as rnn_mod
from seq2seq_abcd_vae_tpu.ops import gru_pallas


def make_inputs(rng, t=7, b=4, in_size=5, hidden=8):
    params = init.rnn_gate_params(jax.random.PRNGKey(0), in_size, hidden, 3)
    x = jnp.asarray(rng.normal(size=(b, t, in_size)).astype(np.float32))
    lengths = jnp.asarray([t, t - 2, 3, 1][:b], jnp.int32)
    mask = rnn_mod.lengths_to_mask(lengths, t)
    xp = rnn_mod.input_proj(params, x)           # (B, T, 3H)
    xp_t = jnp.swapaxes(xp, 0, 1)                # (T, B, 3H)
    mask_t = jnp.swapaxes(mask, 0, 1)            # (T, B)
    return params, x, mask, xp_t, mask_t, lengths


def scan_reference(params, x, mask):
    outs, (h_n, c_n) = rnn_mod.run_rnn_layer("GRU", params, x, mask)
    return jnp.swapaxes(outs, 0, 1), h_n


def test_forward_parity(rng):
    params, x, mask, xp_t, mask_t, lengths = make_inputs(rng)
    want_outs, want_hn = scan_reference(params, x, mask)
    outs, h_n = gru_pallas.gru_layer(xp_t, lengths, params["w_hh"],
                                     params["b_hh"], interpret=True)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(want_outs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_n), np.asarray(want_hn),
                               rtol=1e-5, atol=1e-6)


def test_gradient_parity(rng):
    params, x, mask, xp_t, mask_t, lengths = make_inputs(rng)
    key = jax.random.PRNGKey(3)
    w_out = jax.random.normal(key, (8, 3))

    def loss_pallas(xp, w_hh, b_hh):
        outs, h_n = gru_pallas.gru_layer(xp, lengths, w_hh, b_hh,
                                         interpret=True)
        return jnp.sum(jnp.tanh(outs @ w_out)) + jnp.sum(h_n * h_n)

    def loss_scan(xp, w_hh, b_hh):
        p = dict(params)
        p["w_hh"], p["b_hh"] = w_hh, b_hh

        def step(carry, inp):
            h = carry
            xpt, mt = inp
            h2 = rnn_mod.gru_step(p, xpt, h)
            return jnp.where(mt, h2, h), jnp.where(mt, h2, h)

        b = xp.shape[1]
        h0 = jnp.zeros((b, 8), xp.dtype)
        h_n, outs = jax.lax.scan(step, h0, (xp, mask_t[..., None]))
        return jnp.sum(jnp.tanh(outs @ w_out)) + jnp.sum(h_n * h_n)

    args = (xp_t, params["w_hh"], params["b_hh"])
    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(*args)
    g_scan = jax.grad(loss_scan, argnums=(0, 1, 2))(*args)
    for gp, gs, name in zip(g_pallas, g_scan, ("dxp", "dw_hh", "db_hh")):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   rtol=2e-4, atol=1e-5, err_msg=name)


def test_zero_length_row(rng):
    params, x, mask, xp_t, mask_t, lengths = make_inputs(rng)
    lengths = lengths.at[-1].set(0)  # row 3: fully masked
    outs, h_n = gru_pallas.gru_layer(xp_t, lengths, params["w_hh"],
                                     params["b_hh"], interpret=True)
    np.testing.assert_array_equal(np.asarray(outs)[:, -1], 0.0)
    np.testing.assert_array_equal(np.asarray(h_n)[-1], 0.0)


def test_reverse_direction_via_layer_dispatch(rng, monkeypatch):
    """run_rnn_layer(reverse=True) takes the kernel path for GRU."""
    from seq2seq_abcd_vae_tpu.utils.backend_select import SELECTOR

    params, x, mask, _, _, _ = make_inputs(rng)
    monkeypatch.setenv("SEQ2SEQ_RNN_BACKEND", "scan")
    SELECTOR.reset()
    want_outs, (want_hn, _) = rnn_mod.run_rnn_layer("GRU", params, x, mask,
                                                    reverse=True)
    monkeypatch.setenv("SEQ2SEQ_RNN_BACKEND", "pallas")
    SELECTOR.reset()
    try:
        outs, (h_n, c_n) = rnn_mod.run_rnn_layer("GRU", params, x, mask,
                                                 reverse=True)
    finally:
        monkeypatch.delenv("SEQ2SEQ_RNN_BACKEND")
        SELECTOR.reset()
    np.testing.assert_allclose(np.asarray(outs), np.asarray(want_outs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_n), np.asarray(want_hn),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(c_n), 0.0)


def _bidir_setup(rng, t=7, b=3, in_size=5, hidden=8):
    p_f = init.rnn_gate_params(jax.random.PRNGKey(1), in_size, hidden, 3)
    p_b = init.rnn_gate_params(jax.random.PRNGKey(2), in_size, hidden, 3)
    x = jnp.asarray(rng.normal(size=(b, t, in_size)).astype(np.float32))
    lengths = jnp.asarray([t, 4, 2][:b], jnp.int32)
    mask = rnn_mod.lengths_to_mask(lengths, t)
    return p_f, p_b, x, mask


def _run_bidir(p_f, p_b, x, mask, backend):
    import os

    old = os.environ.get("SEQ2SEQ_ENCODER_BACKEND")
    os.environ["SEQ2SEQ_ENCODER_BACKEND"] = backend
    try:
        return rnn_mod.run_rnn_layer_bidir("GRU", p_f, p_b, x, mask)
    finally:
        if old is None:
            del os.environ["SEQ2SEQ_ENCODER_BACKEND"]
        else:
            os.environ["SEQ2SEQ_ENCODER_BACKEND"] = old


def test_bidir_forward_parity(rng):
    p_f, p_b, x, mask = _bidir_setup(rng)
    sf, sb, sfin = _run_bidir(p_f, p_b, x, mask, "scan")
    kf, kb, kfin = _run_bidir(p_f, p_b, x, mask, "pallas")
    np.testing.assert_allclose(np.asarray(kf), np.asarray(sf), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(kb), np.asarray(sb), rtol=1e-5,
                               atol=1e-6)
    for (sh, sc), (kh, kc) in zip(sfin, kfin):
        np.testing.assert_allclose(np.asarray(kh), np.asarray(sh),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(kc), np.asarray(sc),
                                   rtol=1e-5, atol=1e-6)


def test_bidir_gradient_parity(rng):
    p_f, p_b, x, mask = _bidir_setup(rng)

    def loss(backend, p_f, p_b, x):
        of, ob, fin = _run_bidir(p_f, p_b, x, mask, backend)
        (hf, _), (hb, _) = fin
        return jnp.sum(of * jnp.tanh(ob)) + jnp.sum(hf * hb)

    g_scan = jax.grad(lambda *a: loss("scan", *a), argnums=(0, 1, 2))(
        p_f, p_b, x)
    g_kern = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(
        p_f, p_b, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_scan),
                    jax.tree_util.tree_leaves(g_kern)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)

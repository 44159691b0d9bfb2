"""Fused Pallas Elman-RNN layer kernels: forward and gradient parity
with the lax.scan path (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from seq2seq_abcd_vae_tpu.models import initializers as init
from seq2seq_abcd_vae_tpu.models import rnn as rnn_mod
from seq2seq_abcd_vae_tpu.ops import elman_pallas


def make_inputs(rng, t=7, b=4, in_size=5, hidden=8):
    params = init.rnn_gate_params(jax.random.PRNGKey(0), in_size, hidden, 1)
    x = jnp.asarray(rng.normal(size=(b, t, in_size)).astype(np.float32))
    lengths = jnp.asarray([t, t - 2, 3, 1][:b], jnp.int32)
    mask = rnn_mod.lengths_to_mask(lengths, t)
    xp = rnn_mod.input_proj(params, x)           # (B, T, H)
    xp_t = jnp.swapaxes(xp, 0, 1)                # (T, B, H)
    mask_t = jnp.swapaxes(mask, 0, 1)            # (T, B)
    return params, x, mask, xp_t, mask_t, lengths


def scan_reference(params, x, mask):
    outs, (h_n, c_n) = rnn_mod.run_rnn_layer("RNN", params, x, mask)
    return jnp.swapaxes(outs, 0, 1), h_n


def test_forward_parity(rng):
    params, x, mask, xp_t, mask_t, lengths = make_inputs(rng)
    want_outs, want_hn = scan_reference(params, x, mask)
    outs, h_n = elman_pallas.rnn_layer(xp_t, lengths, params["w_hh"],
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
        outs, h_n = elman_pallas.rnn_layer(xp, lengths, w_hh, b_hh,
                                           interpret=True)
        return jnp.sum(jnp.tanh(outs @ w_out)) + jnp.sum(h_n * h_n)

    def loss_scan(xp, w_hh, b_hh):
        p = dict(params)
        p["w_hh"], p["b_hh"] = w_hh, b_hh

        def step(carry, inp):
            h = carry
            xpt, mt = inp
            h2 = rnn_mod.rnn_step(p, xpt, h)
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
    outs, h_n = elman_pallas.rnn_layer(xp_t, lengths, params["w_hh"],
                                       params["b_hh"], interpret=True)
    np.testing.assert_array_equal(np.asarray(outs)[:, -1], 0.0)
    np.testing.assert_array_equal(np.asarray(h_n)[-1], 0.0)


def test_reverse_direction_via_layer_dispatch(rng, monkeypatch):
    """run_rnn_layer(reverse=True) takes the kernel path for RNN."""
    from seq2seq_abcd_vae_tpu.utils.backend_select import SELECTOR

    params, x, mask, _, _, _ = make_inputs(rng)
    monkeypatch.setenv("SEQ2SEQ_RNN_BACKEND", "scan")
    SELECTOR.reset()
    want_outs, (want_hn, _) = rnn_mod.run_rnn_layer("RNN", params, x, mask,
                                                    reverse=True)
    monkeypatch.setenv("SEQ2SEQ_RNN_BACKEND", "pallas")
    SELECTOR.reset()
    try:
        outs, (h_n, c_n) = rnn_mod.run_rnn_layer("RNN", params, x, mask,
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
    p_f = init.rnn_gate_params(jax.random.PRNGKey(1), in_size, hidden, 1)
    p_b = init.rnn_gate_params(jax.random.PRNGKey(2), in_size, hidden, 1)
    x = jnp.asarray(rng.normal(size=(b, t, in_size)).astype(np.float32))
    lengths = jnp.asarray([t, 4, 2][:b], jnp.int32)
    mask = rnn_mod.lengths_to_mask(lengths, t)
    return p_f, p_b, x, mask


def _run_bidir(p_f, p_b, x, mask, backend):
    import os

    old = os.environ.get("SEQ2SEQ_ENCODER_BACKEND")
    os.environ["SEQ2SEQ_ENCODER_BACKEND"] = backend
    try:
        return rnn_mod.run_rnn_layer_bidir("RNN", p_f, p_b, x, mask)
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


# ---------------------------------------------------------------------------
# ESN layers: the same kernels with static leak < 1 and zero biases
# (reference model.py:444,529-531); dispatched from models/esn.py.
# ---------------------------------------------------------------------------

LEAK = 0.7


class _esn_kernels_on:
    """Opt the ESN paths into the kernels (SEQ2SEQ_ESN_KERNELS gate)."""

    def __enter__(self):
        import os
        self._old = os.environ.get("SEQ2SEQ_ESN_KERNELS")
        os.environ["SEQ2SEQ_ESN_KERNELS"] = "1"

    def __exit__(self, *exc):
        import os
        if self._old is None:
            del os.environ["SEQ2SEQ_ESN_KERNELS"]
        else:
            os.environ["SEQ2SEQ_ESN_KERNELS"] = self._old


def _esn_setup(rng, t=7, b=3, in_size=5, hidden=16):
    from seq2seq_abcd_vae_tpu.models import esn as esn_mod

    p_f = esn_mod.esn_layer_init(jax.random.PRNGKey(4), in_size, hidden)
    p_b = esn_mod.esn_layer_init(jax.random.PRNGKey(5), in_size, hidden)
    assert not np.isnan(np.asarray(p_f["w_hh"])).any()
    assert not np.isnan(np.asarray(p_b["w_hh"])).any()
    x = jnp.asarray(rng.normal(size=(b, t, in_size)).astype(np.float32))
    lengths = jnp.asarray([t, 4, 2][:b], jnp.int32)
    mask = rnn_mod.lengths_to_mask(lengths, t)
    return p_f, p_b, x, mask


def _esn_layer_with_backend(params, x, mask, backend, reverse=False):
    import os

    from seq2seq_abcd_vae_tpu.models import esn as esn_mod
    from seq2seq_abcd_vae_tpu.utils.backend_select import SELECTOR

    old = os.environ.get("SEQ2SEQ_RNN_BACKEND")
    os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
    SELECTOR.reset()
    try:
        with _esn_kernels_on():
            return esn_mod.run_esn_layer(params, x, mask, LEAK,
                                         reverse=reverse)
    finally:
        if old is None:
            del os.environ["SEQ2SEQ_RNN_BACKEND"]
        else:
            os.environ["SEQ2SEQ_RNN_BACKEND"] = old
        SELECTOR.reset()


def test_esn_layer_forward_parity_both_directions(rng):
    p_f, _, x, mask = _esn_setup(rng)
    for reverse in (False, True):
        want_outs, want_hn = _esn_layer_with_backend(p_f, x, mask, "scan",
                                                     reverse)
        outs, h_n = _esn_layer_with_backend(p_f, x, mask, "pallas", reverse)
        np.testing.assert_allclose(np.asarray(outs), np.asarray(want_outs),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"reverse={reverse}")
        np.testing.assert_allclose(np.asarray(h_n), np.asarray(want_hn),
                                   rtol=1e-5, atol=1e-6)


def test_esn_layer_input_gradient_parity(rng):
    """dx through the leak kernel equals the scan path's; the reservoir
    weights get exactly zero grads on BOTH paths (frozen upstream)."""
    p_f, _, x, mask = _esn_setup(rng)

    def loss(backend, params, x):
        outs, h_n = _esn_layer_with_backend(params, x, mask, backend)
        return jnp.sum(outs * jnp.tanh(outs)) + jnp.sum(h_n * h_n)

    for backend in ("scan", "pallas"):
        gw = jax.grad(lambda p: loss(backend, p, x))(p_f)
        np.testing.assert_array_equal(np.asarray(gw["w_ih"]), 0.0)
        np.testing.assert_array_equal(np.asarray(gw["w_hh"]), 0.0)
    gx_s = jax.grad(lambda xx: loss("scan", p_f, xx))(x)
    gx_k = jax.grad(lambda xx: loss("pallas", p_f, xx))(x)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_s),
                               rtol=5e-4, atol=1e-5)


def _esn_bidir_with_backend(p_f, p_b, x, mask, backend):
    import os

    from seq2seq_abcd_vae_tpu.models import esn as esn_mod

    old = os.environ.get("SEQ2SEQ_ENCODER_BACKEND")
    os.environ["SEQ2SEQ_ENCODER_BACKEND"] = backend
    try:
        with _esn_kernels_on():
            return esn_mod.run_esn_layer_bidir(p_f, p_b, x, mask, LEAK)
    finally:
        if old is None:
            del os.environ["SEQ2SEQ_ENCODER_BACKEND"]
        else:
            os.environ["SEQ2SEQ_ENCODER_BACKEND"] = old


def test_esn_bidir_fused_parity(rng):
    p_f, p_b, x, mask = _esn_setup(rng)
    sf, sb, shf, shb = _esn_bidir_with_backend(p_f, p_b, x, mask, "scan")
    kf, kb, khf, khb = _esn_bidir_with_backend(p_f, p_b, x, mask, "pallas")
    for s, k, name in ((sf, kf, "outs_f"), (sb, kb, "outs_b"),
                       (shf, khf, "h_f"), (shb, khb, "h_b")):
        np.testing.assert_allclose(np.asarray(k), np.asarray(s), rtol=1e-5,
                                   atol=1e-6, err_msg=name)

    def loss(backend, x):
        of, ob, hf, hb = _esn_bidir_with_backend(p_f, p_b, x, mask, backend)
        return jnp.sum(of * jnp.tanh(ob)) + jnp.sum(hf * hb)

    gx_s = jax.grad(lambda xx: loss("scan", xx))(x)
    gx_k = jax.grad(lambda xx: loss("pallas", xx))(x)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_s),
                               rtol=5e-4, atol=1e-5)


def test_esn_encoder_backends_agree(rng):
    """Full stacked bidirectional ESN encoder through encoder_apply:
    scan vs kernels, forward and input gradient."""
    import os

    from seq2seq_abcd_vae_tpu.configs import EncoderConfig
    from seq2seq_abcd_vae_tpu.models import encoder as enc
    from seq2seq_abcd_vae_tpu.utils.backend_select import SELECTOR

    cfg = EncoderConfig(5, 16, rnn_type="ESN", bidirectional=True,
                        esn_leak=LEAK, rnn_layers=2)
    params = enc.encoder_init(jax.random.PRNGKey(6), cfg)
    for layer in params["layers"]:
        for d in layer.values():
            assert not np.isnan(np.asarray(d["w_hh"])).any()
    x = jnp.asarray(rng.normal(size=(3, 7, 5)).astype(np.float32))
    lengths = jnp.asarray([7, 5, 2], jnp.int32)

    def run(backend, xx):
        old = os.environ.get("SEQ2SEQ_RNN_BACKEND")
        os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
        SELECTOR.reset()
        try:
            with _esn_kernels_on():
                return enc.encoder_apply(params, cfg, xx, lengths)
        finally:
            if old is None:
                del os.environ["SEQ2SEQ_RNN_BACKEND"]
            else:
                os.environ["SEQ2SEQ_RNN_BACKEND"] = old
            SELECTOR.reset()

    a = run("scan", x)
    b = run("pallas", x)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5,
                               atol=1e-6)
    gx_s = jax.grad(lambda xx: jnp.sum(run("scan", xx) ** 2))(x)
    gx_k = jax.grad(lambda xx: jnp.sum(run("pallas", xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_s),
                               rtol=5e-4, atol=1e-5)

"""bf16 MXU mode (ops/mxu.mxu_dot precision="bf16") parity vs the f32
path, interpret mode, for every kernel family.  The mode casts dot
operands to bf16 with f32 accumulation (one-pass MXU issue on hardware);
deltas must sit at bf16 rounding scale and gradients stay finite.
Hardware step-time A/B lives in BASELINE.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_abcd_vae_tpu.ops import lstm_pallas
from seq2seq_abcd_vae_tpu.ops.decoder_pallas import (decoder_loop,
                                                     gru_decoder_loop)

T, B, F, H, M = 5, 4, 8, 16, 8


def _r(rng, *shape, scale=0.1):
    return jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)


def _lstm_args(rng):
    return dict(
        noise=_r(rng, T, B, F, scale=1.0),
        lengths=jnp.full((B,), T, jnp.float32),
        w_cat=_r(rng, H, 4 * H + 2 * M),
        bias=jnp.zeros((4 * H,), jnp.float32),
        b1_flat=jnp.zeros((2 * M,), jnp.float32),
        w2_mean=_r(rng, M, F), w2_logvar=_r(rng, M, F),
        b2_flat=jnp.zeros((2 * F,), jnp.float32),
        w_ih=_r(rng, F, 4 * H),
        h0=_r(rng, B, H), c0=jnp.zeros((B, H), jnp.float32),
    )


def test_decoder_loop_bf16_close():
    rng = np.random.default_rng(0)
    args = _lstm_args(rng)
    o32 = decoder_loop(**args, interpret=True, precision=None)
    obf = decoder_loop(**args, interpret=True, precision="bf16")
    for a, b in zip(o32, obf):
        np.testing.assert_allclose(a, b, atol=2e-2)

    def loss(w, prec):
        o, m, lv = decoder_loop(**{**args, "w_cat": w}, interpret=True,
                                precision=prec)
        return (o ** 2).sum() + (m ** 2).sum()

    g32 = jax.grad(lambda w: loss(w, None))(args["w_cat"])
    gbf = jax.grad(lambda w: loss(w, "bf16"))(args["w_cat"])
    assert bool(jnp.isfinite(gbf).all())
    np.testing.assert_allclose(g32, gbf, atol=0.05 * float(
        jnp.abs(g32).max()) + 1e-3)


def test_gru_loop_bf16_close():
    rng = np.random.default_rng(1)
    args = (
        _r(rng, T, B, F, scale=1.0), jnp.full((B,), T, jnp.float32),
        _r(rng, H, 3 * H + 2 * M),
        jnp.zeros((3 * H,), jnp.float32), jnp.zeros((3 * H,), jnp.float32),
        jnp.zeros((2 * M,), jnp.float32), _r(rng, M, F), _r(rng, M, F),
        jnp.zeros((2 * F,), jnp.float32), _r(rng, F, 3 * H), _r(rng, B, H),
    )
    o32 = gru_decoder_loop(*args, interpret=True, precision=None)
    obf = gru_decoder_loop(*args, interpret=True, precision="bf16")
    np.testing.assert_allclose(o32, obf, atol=2e-2)


def test_lstm_layer_bf16_close():
    rng = np.random.default_rng(2)
    xp = _r(rng, T, B, 4 * H)
    lengths = jnp.full((B,), T, jnp.int32)
    w = _r(rng, H, 4 * H)
    b = jnp.zeros((4 * H,), jnp.float32)
    o32 = lstm_pallas.lstm_layer(xp, lengths, w, b, interpret=True,
                                 precision=None)
    obf = lstm_pallas.lstm_layer(xp, lengths, w, b, interpret=True,
                                 precision="bf16")
    np.testing.assert_allclose(o32[0], obf[0], atol=2e-2)
    g = jax.grad(lambda w: (lstm_pallas.lstm_layer(
        xp, lengths, w, b, interpret=True, precision="bf16")[0] ** 2).sum())(w)
    assert bool(jnp.isfinite(g).all())


def test_bidir_fused_bf16_close():
    rng = np.random.default_rng(3)
    x = _r(rng, T, B, F)
    lengths2 = jnp.full((B,), T, jnp.int32)
    wih = _r(rng, 2, F, 4 * H)
    bih = jnp.zeros((2, 4 * H), jnp.float32)
    whh = _r(rng, 2, H, 4 * H)
    bhh = jnp.zeros((2, 4 * H), jnp.float32)
    o32 = lstm_pallas.lstm_layer_bidir_fused(x, lengths2, wih, bih, whh, bhh,
                                             interpret=True, precision=None)
    obf = lstm_pallas.lstm_layer_bidir_fused(x, lengths2, wih, bih, whh, bhh,
                                             interpret=True,
                                             precision="bf16")
    np.testing.assert_allclose(o32[0], obf[0], atol=2e-2)


def test_kernel_precision_env(monkeypatch):
    from seq2seq_abcd_vae_tpu.models import rnn as rnn_mod
    prev = jax.config.jax_default_matmul_precision
    try:
        jax.config.update("jax_default_matmul_precision", "highest")
        monkeypatch.setenv("SEQ2SEQ_KERNEL_MXU", "bf16")
        # 'highest' (the parity default) always stays f32
        assert rnn_mod.kernel_precision() == jax.lax.Precision.HIGHEST
        jax.config.update("jax_default_matmul_precision", "default")
        assert rnn_mod.kernel_precision() == "bf16"
        monkeypatch.delenv("SEQ2SEQ_KERNEL_MXU")
        assert rnn_mod.kernel_precision() is None
    finally:
        jax.config.update("jax_default_matmul_precision",
                          prev if prev is not None else "default")

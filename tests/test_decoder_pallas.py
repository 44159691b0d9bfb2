"""Parity of the fused Pallas decoder-loop kernel (ops/decoder_pallas.py)
with the scan path (models/decoder.py:_run_direction), forward and
gradients, in interpret mode on CPU."""

import numpy as np

import jax
import jax.numpy as jnp

from seq2seq_abcd_vae_tpu.configs import DecoderConfig
from seq2seq_abcd_vae_tpu.models import decoder as dec
from seq2seq_abcd_vae_tpu.ops import decoder_pallas


B, T, H, M, F = 3, 7, 8, 6, 5


def setup():
    cfg = DecoderConfig(output_size=F, rnn_hidden_size=H, mlp_hidden_size=M,
                        feature_size=4, rnn_type="LSTM")
    params = dec.decoder_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    c0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    lengths = jnp.asarray([T, 4, 2])
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    key = jax.random.PRNGKey(7)
    return cfg, params, h0, c0, mask, key


def kernel_inputs(cfg, params, h0, c0, mask, key):
    """Replicate _run_direction's pre-scan setup for the kernel."""
    from seq2seq_abcd_vae_tpu import distributions as dist
    d = dist.choose_distribution(cfg.emission_distr_name)
    cell = params["rnn_cell"]
    em = params["emission_sampler"]["to_parameters"]
    t = mask.shape[1]
    lengths = jnp.sum(mask.astype(jnp.float32), axis=1)
    k_noise, _ = jax.random.split(key)
    noise_t = d.noise(k_noise, (t, B, F), h0.dtype)
    w1 = em["lin1"]["w"]
    k, h_in, m = w1.shape
    w1_flat = jnp.moveaxis(w1, 0, 1).reshape(h_in, k * m)
    w_cat = jnp.concatenate([cell["w_hh"], w1_flat], axis=1)
    return dict(
        noise=noise_t, lengths=lengths,
        w_cat=w_cat, bias=cell["b_ih"] + cell["b_hh"],
        b1_flat=em["lin1"]["b"].reshape(-1),
        w2_mean=em["lin2"]["w"][0], w2_logvar=em["lin2"]["w"][1],
        b2_flat=em["lin2"]["b"].reshape(-1),
        w_ih=cell["w_ih"], h0=h0, c0=c0)


def test_forward_matches_scan():
    cfg, params, h0, c0, mask, key = setup()
    rnn_out, em_params, _ = dec._run_direction(
        cfg, params["rnn_cell"], params["emission_sampler"], h0, c0, mask,
        key, True, "sample")
    ki = kernel_inputs(cfg, params, h0, c0, mask, key)
    outs, mean_s, logvar_s = decoder_pallas.decoder_loop(interpret=True,
                                                         **ki)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(outs, 0, 1)),
                               np.asarray(rnn_out), rtol=2e-5, atol=2e-6)
    # the kernel's streams are position-indexed (slot p = the scan
    # path's position-p emission wherever mask_p = 1; padded positions
    # intentionally hold frozen-carry values; slot T-1 is the caller's
    # final-position overwrite)
    m = np.asarray(mask)[:, :T - 1]  # (B, T-1) validity of positions
    for kern_s, scan_p in ((mean_s, em_params[0]),
                           (logvar_s, em_params[1])):
        kern_pos = np.asarray(jnp.swapaxes(kern_s[:T - 1], 0, 1))
        scan_pos = np.asarray(scan_p)[:, :T - 1]
        np.testing.assert_allclose(kern_pos[m], scan_pos[m], rtol=2e-5,
                                   atol=2e-6)


def test_dispatch_through_decoder_apply():
    """SEQ2SEQ_RNN_BACKEND=pallas routes decoder_apply's default config
    through the kernel; losses must match the scan path."""
    import os

    from seq2seq_abcd_vae_tpu.utils import backend_select

    cfg, params, _, _, _, _ = setup()
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    lengths = jnp.asarray([T, 4, 2])
    gt = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    off = np.zeros((B, T), np.float32)
    off[0, T - 1] = 1.0
    off[1, 3] = 1.0
    off[2, 1] = 1.0
    off = jnp.asarray(off)

    def run_with(backend):
        old = os.environ.get("SEQ2SEQ_RNN_BACKEND")
        os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
        backend_select.resolve_rnn_backend.cache_clear()
        try:
            return dec.decoder_apply(
                params, cfg, feats, lengths, T, ground_truth_out=gt,
                ground_truth_offset=off, key=jax.random.PRNGKey(5),
                deterministic=False, emission_mode="sample")
        finally:
            if old is None:
                del os.environ["SEQ2SEQ_RNN_BACKEND"]
            else:
                os.environ["SEQ2SEQ_RNN_BACKEND"] = old
            backend_select.resolve_rnn_backend.cache_clear()

    a = run_with("scan")
    b = run_with("pallas")
    np.testing.assert_allclose(float(b.emission_loss),
                               float(a.emission_loss), rtol=1e-4)
    np.testing.assert_allclose(float(b.offset_loss),
                               float(a.offset_loss), rtol=1e-4)
    # padded positions hold backend-dependent garbage by contract (the
    # LSTM kernel emits frozen-carry emissions there); compare valid ones
    valid = np.asarray(jnp.arange(T)[None, :] < np.asarray(lengths)[:, None])
    np.testing.assert_allclose(np.asarray(b.out)[valid],
                               np.asarray(a.out)[valid],
                               rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# GRU kernel (reference treats -R GRU as first-class, model.py:53,295)
# ---------------------------------------------------------------------------

def setup_gru():
    cfg = DecoderConfig(output_size=F, rnn_hidden_size=H, mlp_hidden_size=M,
                        feature_size=4, rnn_type="GRU")
    params = dec.decoder_init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(4)
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    c0 = jnp.zeros((B, H), jnp.float32)
    lengths = jnp.asarray([T, 4, 2])
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    key = jax.random.PRNGKey(9)
    return cfg, params, h0, c0, mask, key


def gru_kernel_inputs(cfg, params, h0, mask, key):
    from seq2seq_abcd_vae_tpu import distributions as dist
    d = dist.choose_distribution(cfg.emission_distr_name)
    cell = params["rnn_cell"]
    em = params["emission_sampler"]["to_parameters"]
    t = mask.shape[1]
    lengths = jnp.sum(mask.astype(jnp.float32), axis=1)
    k_noise, _ = jax.random.split(key)
    noise_t = d.noise(k_noise, (t, B, F), h0.dtype)
    w1 = em["lin1"]["w"]
    k, h_in, m = w1.shape
    w1_flat = jnp.moveaxis(w1, 0, 1).reshape(h_in, k * m)
    w_cat = jnp.concatenate([cell["w_hh"], w1_flat], axis=1)
    return dict(
        noise=noise_t, lengths=lengths,
        w_cat=w_cat, b_ih=cell["b_ih"], b_hh=cell["b_hh"],
        b1_flat=em["lin1"]["b"].reshape(-1),
        w2_mean=em["lin2"]["w"][0], w2_logvar=em["lin2"]["w"][1],
        b2_flat=em["lin2"]["b"].reshape(-1),
        w_ih=cell["w_ih"], h0=h0)


def test_gru_forward_matches_scan():
    cfg, params, h0, c0, mask, key = setup_gru()
    rnn_out, _, _ = dec._run_direction(
        cfg, params["rnn_cell"], params["emission_sampler"], h0, c0, mask,
        key, True, "sample")
    ki = gru_kernel_inputs(cfg, params, h0, mask, key)
    outs = decoder_pallas.gru_decoder_loop(interpret=True, **ki)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(outs, 0, 1)),
                               np.asarray(rnn_out), rtol=2e-5, atol=2e-6)


def test_gru_dispatch_through_decoder_apply():
    import os

    from seq2seq_abcd_vae_tpu.utils import backend_select

    cfg, params, _, _, _, _ = setup_gru()
    rng = np.random.default_rng(6)
    feats = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    lengths = jnp.asarray([T, 4, 2])
    gt = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    off = np.zeros((B, T), np.float32)
    off[0, T - 1] = 1.0
    off[1, 3] = 1.0
    off[2, 1] = 1.0
    off = jnp.asarray(off)

    def run_with(backend):
        old = os.environ.get("SEQ2SEQ_RNN_BACKEND")
        os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
        backend_select.resolve_rnn_backend.cache_clear()
        try:
            return dec.decoder_apply(
                params, cfg, feats, lengths, T, ground_truth_out=gt,
                ground_truth_offset=off, key=jax.random.PRNGKey(5),
                deterministic=False, emission_mode="sample")
        finally:
            if old is None:
                del os.environ["SEQ2SEQ_RNN_BACKEND"]
            else:
                os.environ["SEQ2SEQ_RNN_BACKEND"] = old
            backend_select.resolve_rnn_backend.cache_clear()

    a = run_with("scan")
    b = run_with("pallas")
    np.testing.assert_allclose(float(b.emission_loss),
                               float(a.emission_loss), rtol=1e-4)
    np.testing.assert_allclose(float(b.offset_loss),
                               float(a.offset_loss), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b.out), np.asarray(a.out),
                               rtol=2e-4, atol=2e-5)


def test_gru_gradients_match_scan():
    cfg, params, h0, c0, mask, key = setup_gru()

    def loss_scan(cell, emsampler, h0):
        rnn_out, _, _ = dec._run_direction(cfg, cell, emsampler, h0, c0,
                                           mask, key, True, "sample")
        return jnp.sum(rnn_out * jnp.tanh(rnn_out))

    def loss_kernel(cell, emsampler, h0):
        p2 = dict(params)
        p2["rnn_cell"] = cell
        p2["emission_sampler"] = emsampler
        ki = gru_kernel_inputs(cfg, p2, h0, mask, key)
        outs = decoder_pallas.gru_decoder_loop(interpret=True, **ki)
        rnn_out = jnp.swapaxes(outs, 0, 1)
        return jnp.sum(rnn_out * jnp.tanh(rnn_out))

    args = (params["rnn_cell"], params["emission_sampler"], h0)
    g_scan = jax.grad(loss_scan, argnums=(0, 1, 2))(*args)
    g_kern = jax.grad(loss_kernel, argnums=(0, 1, 2))(*args)
    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_k, _ = jax.tree_util.tree_flatten(g_kern)
    assert len(flat_s) == len(flat_k)
    for a, b in zip(flat_s, flat_k):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# Elman-RNN kernel (-R RNN, the third trainable cell, model.py:53,295)
# ---------------------------------------------------------------------------

def setup_rnn():
    cfg = DecoderConfig(output_size=F, rnn_hidden_size=H, mlp_hidden_size=M,
                        feature_size=4, rnn_type="RNN")
    params = dec.decoder_init(jax.random.PRNGKey(11), cfg)
    rng = np.random.default_rng(12)
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    c0 = jnp.zeros((B, H), jnp.float32)
    lengths = jnp.asarray([T, 4, 2])
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    key = jax.random.PRNGKey(13)
    return cfg, params, h0, c0, mask, key


def rnn_kernel_inputs(cfg, params, h0, mask, key):
    from seq2seq_abcd_vae_tpu import distributions as dist
    d = dist.choose_distribution(cfg.emission_distr_name)
    cell = params["rnn_cell"]
    em = params["emission_sampler"]["to_parameters"]
    t = mask.shape[1]
    lengths = jnp.sum(mask.astype(jnp.float32), axis=1)
    k_noise, _ = jax.random.split(key)
    noise_t = d.noise(k_noise, (t, B, F), h0.dtype)
    w1 = em["lin1"]["w"]
    k, h_in, m = w1.shape
    w1_flat = jnp.moveaxis(w1, 0, 1).reshape(h_in, k * m)
    w_cat = jnp.concatenate([cell["w_hh"], w1_flat], axis=1)
    return dict(
        noise=noise_t, lengths=lengths,
        w_cat=w_cat, bias=cell["b_ih"] + cell["b_hh"],
        b1_flat=em["lin1"]["b"].reshape(-1),
        w2_mean=em["lin2"]["w"][0], w2_logvar=em["lin2"]["w"][1],
        b2_flat=em["lin2"]["b"].reshape(-1),
        w_ih=cell["w_ih"], h0=h0)


def test_rnn_forward_matches_scan():
    cfg, params, h0, c0, mask, key = setup_rnn()
    rnn_out, _, _ = dec._run_direction(
        cfg, params["rnn_cell"], params["emission_sampler"], h0, c0, mask,
        key, True, "sample")
    ki = rnn_kernel_inputs(cfg, params, h0, mask, key)
    outs = decoder_pallas.rnn_decoder_loop(interpret=True, **ki)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(outs, 0, 1)),
                               np.asarray(rnn_out), rtol=2e-5, atol=2e-6)


def test_rnn_dispatch_through_decoder_apply():
    import os

    from seq2seq_abcd_vae_tpu.utils import backend_select

    cfg, params, _, _, _, _ = setup_rnn()
    rng = np.random.default_rng(14)
    feats = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    lengths = jnp.asarray([T, 4, 2])
    gt = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    off = np.zeros((B, T), np.float32)
    off[0, T - 1] = 1.0
    off[1, 3] = 1.0
    off[2, 1] = 1.0
    off = jnp.asarray(off)

    def run_with(backend):
        old = os.environ.get("SEQ2SEQ_RNN_BACKEND")
        os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
        backend_select.resolve_rnn_backend.cache_clear()
        try:
            return dec.decoder_apply(
                params, cfg, feats, lengths, T, ground_truth_out=gt,
                ground_truth_offset=off, key=jax.random.PRNGKey(5),
                deterministic=False, emission_mode="sample")
        finally:
            if old is None:
                del os.environ["SEQ2SEQ_RNN_BACKEND"]
            else:
                os.environ["SEQ2SEQ_RNN_BACKEND"] = old
            backend_select.resolve_rnn_backend.cache_clear()

    a = run_with("scan")
    b = run_with("pallas")
    np.testing.assert_allclose(float(b.emission_loss),
                               float(a.emission_loss), rtol=1e-4)
    np.testing.assert_allclose(float(b.offset_loss),
                               float(a.offset_loss), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b.out), np.asarray(a.out),
                               rtol=2e-4, atol=2e-5)


def test_rnn_gradients_match_scan():
    cfg, params, h0, c0, mask, key = setup_rnn()

    def loss_scan(cell, emsampler, h0):
        rnn_out, _, _ = dec._run_direction(cfg, cell, emsampler, h0, c0,
                                           mask, key, True, "sample")
        return jnp.sum(rnn_out * jnp.tanh(rnn_out))

    def loss_kernel(cell, emsampler, h0):
        p2 = dict(params)
        p2["rnn_cell"] = cell
        p2["emission_sampler"] = emsampler
        ki = rnn_kernel_inputs(cfg, p2, h0, mask, key)
        outs = decoder_pallas.rnn_decoder_loop(interpret=True, **ki)
        rnn_out = jnp.swapaxes(outs, 0, 1)
        return jnp.sum(rnn_out * jnp.tanh(rnn_out))

    args = (params["rnn_cell"], params["emission_sampler"], h0)
    g_scan = jax.grad(loss_scan, argnums=(0, 1, 2))(*args)
    g_kern = jax.grad(loss_kernel, argnums=(0, 1, 2))(*args)
    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_k, _ = jax.tree_util.tree_flatten(g_kern)
    assert len(flat_s) == len(flat_k)
    for a, b in zip(flat_s, flat_k):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_gradients_match_scan():
    cfg, params, h0, c0, mask, key = setup()

    def loss_scan(cell, emsampler, h0, c0):
        rnn_out, _, _ = dec._run_direction(cfg, cell, emsampler, h0, c0,
                                           mask, key, True, "sample")
        return jnp.sum(rnn_out * jnp.tanh(rnn_out))

    def loss_kernel(cell, emsampler, h0, c0):
        p2 = dict(params)
        p2["rnn_cell"] = cell
        p2["emission_sampler"] = emsampler
        ki = kernel_inputs(cfg, p2, h0, c0, mask, key)
        outs, _, _ = decoder_pallas.decoder_loop(interpret=True, **ki)
        rnn_out = jnp.swapaxes(outs, 0, 1)
        return jnp.sum(rnn_out * jnp.tanh(rnn_out))

    args = (params["rnn_cell"], params["emission_sampler"], h0, c0)
    g_scan = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(*args)
    g_kern = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(*args)
    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_k, tree_k = jax.tree_util.tree_flatten(g_kern)
    assert len(flat_s) == len(flat_k)
    for a, b in zip(flat_s, flat_k):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_emission_loss_gradients_match_scan():
    """Gradients THROUGH the emitted mean/logvar streams (the dmean/
    dlogvar adjoint inputs of the backward kernel): the full
    decoder_apply emission+offset loss must produce the same parameter
    gradients on both backends."""
    import os

    from seq2seq_abcd_vae_tpu.utils import backend_select

    cfg, params, _, _, _, _ = setup()
    rng = np.random.default_rng(8)
    feats = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    lengths = jnp.asarray([T, 4, 2])
    gt = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    off = jnp.zeros((B, T), jnp.float32)

    def loss(p, backend):
        old = os.environ.get("SEQ2SEQ_RNN_BACKEND")
        os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
        backend_select.resolve_rnn_backend.cache_clear()
        try:
            o = dec.decoder_apply(
                p, cfg, feats, lengths, T, ground_truth_out=gt,
                ground_truth_offset=off, key=jax.random.PRNGKey(5),
                deterministic=False, emission_mode="sample")
            return o.emission_loss + o.offset_loss
        finally:
            if old is None:
                del os.environ["SEQ2SEQ_RNN_BACKEND"]
            else:
                os.environ["SEQ2SEQ_RNN_BACKEND"] = old
            backend_select.resolve_rnn_backend.cache_clear()

    g_scan = jax.grad(lambda p: loss(p, "scan"))(params)
    g_kern = jax.grad(lambda p: loss(p, "pallas"))(params)
    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_k, _ = jax.tree_util.tree_flatten(g_kern)
    assert len(flat_s) == len(flat_k)
    for a, b in zip(flat_s, flat_k):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_fused_nll_matches_stream_kernel_and_scan():
    """loss_only=True routes the LSTM config through the fused in-kernel
    NLL path (decoder_loop_fused_nll): the emission/offset losses must
    match both the stream-kernel path and the scan path, and the fused
    DecoderOutput must carry no dead (B, T, F) streams."""
    import os

    from seq2seq_abcd_vae_tpu.utils import backend_select

    cfg, params, _, _, _, _ = setup()
    rng = np.random.default_rng(21)
    feats = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    lengths = jnp.asarray([T, 4, 2])
    gt = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    off = np.zeros((B, T), np.float32)
    off[0, T - 1] = 1.0
    off[1, 3] = 1.0
    off[2, 1] = 1.0
    off = jnp.asarray(off)

    def run_with(backend, loss_only):
        old = os.environ.get("SEQ2SEQ_RNN_BACKEND")
        os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
        backend_select.resolve_rnn_backend.cache_clear()
        try:
            return dec.decoder_apply(
                params, cfg, feats, lengths, T, ground_truth_out=gt,
                ground_truth_offset=off, key=jax.random.PRNGKey(5),
                deterministic=False, emission_mode="sample",
                loss_only=loss_only)
        finally:
            if old is None:
                del os.environ["SEQ2SEQ_RNN_BACKEND"]
            else:
                os.environ["SEQ2SEQ_RNN_BACKEND"] = old
            backend_select.resolve_rnn_backend.cache_clear()

    scan_o = run_with("scan", False)
    stream_o = run_with("pallas", False)
    fused_o = run_with("pallas", True)
    # the gate actually engaged: no dead streams materialized (with
    # offsets given, the offset MLP+BCE are fused too, so the logits
    # never exist either)
    assert fused_o.out is None
    assert fused_o.emission_params == ()
    assert fused_o.offset_weights is None
    for ref in (scan_o, stream_o):
        np.testing.assert_allclose(float(fused_o.emission_loss),
                                   float(ref.emission_loss), rtol=1e-4)
        np.testing.assert_allclose(float(fused_o.offset_loss),
                                   float(ref.offset_loss), rtol=1e-4)


def test_fused_nll_gradients_match_scan():
    """Parameter gradients through the fused in-kernel NLL (the scalar
    cotangent enters the backward kernel as SMEM g, the emission-loss
    cotangents are computed in-register from the streamed targets) must
    equal the scan path's."""
    import os

    from seq2seq_abcd_vae_tpu.utils import backend_select

    cfg, params, _, _, _, _ = setup()
    rng = np.random.default_rng(22)
    feats = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    lengths = jnp.asarray([T, 4, 2])
    gt = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    # the loss_only contract: offsets are (t == len-1), as the Learner
    # derives them — the fused kernel synthesizes this target from
    # lengths, so the scan reference must use the same one
    off = np.zeros((B, T), np.float32)
    off[np.arange(B), np.asarray(lengths) - 1] = 1.0
    off = jnp.asarray(off)

    def loss(p, backend, loss_only):
        old = os.environ.get("SEQ2SEQ_RNN_BACKEND")
        os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
        backend_select.resolve_rnn_backend.cache_clear()
        try:
            o = dec.decoder_apply(
                p, cfg, feats, lengths, T, ground_truth_out=gt,
                ground_truth_offset=off, key=jax.random.PRNGKey(5),
                deterministic=False, emission_mode="sample",
                loss_only=loss_only)
            # scale both terms so the SMEM cotangents are non-trivial
            # scalars, not 1.0
            return 0.37 * o.emission_loss + 0.61 * o.offset_loss
        finally:
            if old is None:
                del os.environ["SEQ2SEQ_RNN_BACKEND"]
            else:
                os.environ["SEQ2SEQ_RNN_BACKEND"] = old
            backend_select.resolve_rnn_backend.cache_clear()

    g_scan = jax.grad(lambda p: loss(p, "scan", False))(params)
    g_fused = jax.grad(lambda p: loss(p, "pallas", True))(params)
    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    assert len(flat_s) == len(flat_f)
    for a, b in zip(flat_s, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_fused_nll_only_path_without_offsets():
    """With ground_truth_offset=None, loss_only routes through the
    NLL-only fused kernel (full outs stream kept for nothing but the
    caller's own use): emission loss and its gradients must still match
    scan."""
    import os

    from seq2seq_abcd_vae_tpu.utils import backend_select

    cfg, params, _, _, _, _ = setup()
    rng = np.random.default_rng(23)
    feats = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    lengths = jnp.asarray([T, 4, 2])
    gt = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))

    def loss(p, backend, loss_only):
        old = os.environ.get("SEQ2SEQ_RNN_BACKEND")
        os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
        backend_select.resolve_rnn_backend.cache_clear()
        try:
            o = dec.decoder_apply(
                p, cfg, feats, lengths, T, ground_truth_out=gt,
                ground_truth_offset=None, key=jax.random.PRNGKey(5),
                deterministic=False, emission_mode="sample",
                loss_only=loss_only)
            return 0.43 * o.emission_loss
        finally:
            if old is None:
                del os.environ["SEQ2SEQ_RNN_BACKEND"]
            else:
                os.environ["SEQ2SEQ_RNN_BACKEND"] = old
            backend_select.resolve_rnn_backend.cache_clear()

    ls, g_scan = jax.value_and_grad(
        lambda p: loss(p, "scan", False))(params)
    lf, g_fused = jax.value_and_grad(
        lambda p: loss(p, "pallas", True))(params)
    np.testing.assert_allclose(float(lf), float(ls), rtol=1e-4)
    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    for a, b in zip(flat_s, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_gru_fused_losses_match_scan(monkeypatch):
    """GRU loss_only full fusion (gru_decoder_loop_fused_losses):
    losses and parameter gradients must match the scan path, with the
    length-derived offset contract."""
    import os

    from seq2seq_abcd_vae_tpu.utils import backend_select

    # GRU/RNN fused-loss dispatch is opt-in until hardware grad parity is
    # recorded (models/decoder.py:_fused_loss_cells)
    monkeypatch.setenv("SEQ2SEQ_FUSED_CELLS", "GRU,RNN")

    cfg, params, _, _, _, _ = setup_gru()
    rng = np.random.default_rng(24)
    feats = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    lengths = jnp.asarray([T, 4, 2])
    gt = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    off = np.zeros((B, T), np.float32)
    off[np.arange(B), np.asarray(lengths) - 1] = 1.0
    off = jnp.asarray(off)

    def run(p, backend, loss_only, reduce=False):
        old = os.environ.get("SEQ2SEQ_RNN_BACKEND")
        os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
        backend_select.resolve_rnn_backend.cache_clear()
        try:
            o = dec.decoder_apply(
                p, cfg, feats, lengths, T, ground_truth_out=gt,
                ground_truth_offset=off, key=jax.random.PRNGKey(5),
                deterministic=False, emission_mode="sample",
                loss_only=loss_only)
            if reduce:
                return 0.37 * o.emission_loss + 0.61 * o.offset_loss
            return o
        finally:
            if old is None:
                del os.environ["SEQ2SEQ_RNN_BACKEND"]
            else:
                os.environ["SEQ2SEQ_RNN_BACKEND"] = old
            backend_select.resolve_rnn_backend.cache_clear()

    scan_o = run(params, "scan", False)
    fused_o = run(params, "pallas", True)
    assert fused_o.out is None and fused_o.offset_weights is None
    np.testing.assert_allclose(float(fused_o.emission_loss),
                               float(scan_o.emission_loss), rtol=1e-4)
    np.testing.assert_allclose(float(fused_o.offset_loss),
                               float(scan_o.offset_loss), rtol=1e-4)

    g_scan = jax.grad(lambda p: run(p, "scan", False, True))(params)
    g_fused = jax.grad(lambda p: run(p, "pallas", True, True))(params)
    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    assert len(flat_s) == len(flat_f)
    for a, b in zip(flat_s, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_fused_cells_gate(monkeypatch):
    """GRU/Elman/ESN fused-loss dispatch defaults ON (hardware parity +
    A/B evidence in PROFILE_r04.json); the env allowlist narrows it
    (empty = stream path) and parses a comma list."""
    monkeypatch.delenv("SEQ2SEQ_FUSED_CELLS", raising=False)
    assert dec._fused_loss_cells() == ("GRU", "RNN", "ESN")
    monkeypatch.setenv("SEQ2SEQ_FUSED_CELLS", "")
    assert dec._fused_loss_cells() == ()
    monkeypatch.setenv("SEQ2SEQ_FUSED_CELLS", "GRU, RNN")
    assert dec._fused_loss_cells() == ("GRU", "RNN")


def test_rnn_fused_losses_match_scan(monkeypatch):
    """Elman loss_only full fusion (rnn_decoder_loop_fused_losses):
    losses and parameter gradients must match the scan path."""
    import os

    from seq2seq_abcd_vae_tpu.utils import backend_select

    monkeypatch.setenv("SEQ2SEQ_FUSED_CELLS", "GRU,RNN")

    cfg = DecoderConfig(output_size=F, rnn_hidden_size=H,
                        mlp_hidden_size=M, feature_size=4,
                        rnn_type="RNN")
    params = dec.decoder_init(jax.random.PRNGKey(8), cfg)
    rng = np.random.default_rng(25)
    feats = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    lengths = jnp.asarray([T, 4, 2])
    gt = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    off = np.zeros((B, T), np.float32)
    off[np.arange(B), np.asarray(lengths) - 1] = 1.0
    off = jnp.asarray(off)

    def run(p, backend, loss_only, reduce=False):
        old = os.environ.get("SEQ2SEQ_RNN_BACKEND")
        os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
        backend_select.resolve_rnn_backend.cache_clear()
        try:
            o = dec.decoder_apply(
                p, cfg, feats, lengths, T, ground_truth_out=gt,
                ground_truth_offset=off, key=jax.random.PRNGKey(5),
                deterministic=False, emission_mode="sample",
                loss_only=loss_only)
            if reduce:
                return 0.37 * o.emission_loss + 0.61 * o.offset_loss
            return o
        finally:
            if old is None:
                del os.environ["SEQ2SEQ_RNN_BACKEND"]
            else:
                os.environ["SEQ2SEQ_RNN_BACKEND"] = old
            backend_select.resolve_rnn_backend.cache_clear()

    scan_o = run(params, "scan", False)
    fused_o = run(params, "pallas", True)
    assert fused_o.out is None and fused_o.offset_weights is None
    np.testing.assert_allclose(float(fused_o.emission_loss),
                               float(scan_o.emission_loss), rtol=1e-4)
    np.testing.assert_allclose(float(fused_o.offset_loss),
                               float(scan_o.offset_loss), rtol=1e-4)

    g_scan = jax.grad(lambda p: run(p, "scan", False, True))(params)
    g_fused = jax.grad(lambda p: run(p, "pallas", True, True))(params)
    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    assert len(flat_s) == len(flat_f)
    for a, b in zip(flat_s, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_bf16_stream_dtype_contract():
    """SEQ2SEQ_STREAM_DTYPE=bf16 stores the decoder-loop kernels' saved
    carry trajectories in bfloat16 (all three cells, fused-loss path).
    Contract: the forward losses are BIT-unchanged (the streams are
    backward-recompute inputs only); gradients deviate only at bf16
    rounding scale; default stays f32."""
    import os

    from seq2seq_abcd_vae_tpu.ops import decoder_pallas as dp

    b, t, h, f, m = 4, 9, 16, 8, 12
    rng = np.random.default_rng(5)
    A = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32)) * 0.3
    lengths = jnp.asarray(np.r_[t, rng.integers(2, t + 1, b - 1)]
                          .astype(np.float32))
    noise, targets, h0, c0 = A(t, b, f), A(t, b, f), A(b, h), A(b, h)
    wo1, bo1, wo2, bo2 = A(h, m), A(1, m), A(1, m), A(1, 1)
    b1, w2m, w2v, b2 = A(2 * m), A(m, f), A(m, f), A(2 * f)

    b4, b3g, b3h, b1h = A(4 * h), A(3 * h), A(3 * h), A(h)

    def lstm(wcat, wih):
        out_last, nll, bce = dp.decoder_loop_fused_losses(
            noise, lengths, wcat, b4, b1, w2m, w2v, b2, wih,
            targets, wo1, bo1, wo2, bo2, h0, c0, interpret=True)
        return nll + bce + jnp.sum(out_last)

    def gru(wcat, wih):
        out_last, nll, bce = dp.gru_decoder_loop_fused_losses(
            noise, lengths, wcat, b3g, b3h, b1, w2m, w2v, b2,
            wih, targets, wo1, bo1, wo2, bo2, h0, interpret=True)
        return nll + bce + jnp.sum(out_last)

    def rnn(wcat, wih):
        out_last, nll, bce = dp.rnn_decoder_loop_fused_losses(
            noise, lengths, wcat, b1h, b1, w2m, w2v, b2, wih,
            targets, wo1, bo1, wo2, bo2, h0, interpret=True)
        return nll + bce + jnp.sum(out_last)

    assert dp._stream_dtype() == jnp.float32  # default
    cases = [(lstm, A(h, 4 * h + 2 * m), A(f, 4 * h)),
             (gru, A(h, 3 * h + 2 * m), A(f, 3 * h)),
             (rnn, A(h, h + 2 * m), A(f, h))]
    for fn, wcat, wih in cases:
        res = {}
        for sd in ("f32", "bf16"):
            os.environ["SEQ2SEQ_STREAM_DTYPE"] = sd
            try:
                l, g = jax.jit(jax.value_and_grad(fn, argnums=(0, 1)))(
                    wcat, wih)
            finally:
                del os.environ["SEQ2SEQ_STREAM_DTYPE"]
            res[sd] = (float(l), np.asarray(g[0]), np.asarray(g[1]))
        assert res["f32"][0] == res["bf16"][0]  # fwd loss bit-equal
        for i in (1, 2):
            a, bb = res["f32"][i], res["bf16"][i]
            assert np.isfinite(bb).all()
            rel = np.max(np.abs(a - bb)) / (np.max(np.abs(a)) + 1e-9)
            assert 0 < rel < 5e-2  # bf16 rounding scale, and really bf16


# ---------------------------------------------------------------------------
# ESN kernel (-R ESN: leaky-tanh Elman with frozen, bias-free reservoir,
# model.py:444,488,529-531) — the leak-generalized Elman kernels
# ---------------------------------------------------------------------------

H_ESN = 16  # tiny reservoirs (H=8) can be nilpotent -> radius-0 NaN init
LEAK = 0.7


def setup_esn():
    cfg = DecoderConfig(output_size=F, rnn_hidden_size=H_ESN,
                        mlp_hidden_size=M, feature_size=4, rnn_type="ESN",
                        esn_leak=LEAK)
    params = dec.decoder_init(jax.random.PRNGKey(17), cfg)
    assert not np.isnan(
        np.asarray(params["rnn_cell"]["w_hh"])).any()
    rng = np.random.default_rng(18)
    h0 = jnp.asarray(rng.normal(size=(B, H_ESN)).astype(np.float32))
    c0 = jnp.zeros((B, H_ESN), jnp.float32)
    lengths = jnp.asarray([T, 4, 2])
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    key = jax.random.PRNGKey(19)
    return cfg, params, h0, c0, mask, key


def esn_kernel_inputs(cfg, params, h0, mask, key):
    from seq2seq_abcd_vae_tpu import distributions as dist
    d = dist.choose_distribution(cfg.emission_distr_name)
    cell = params["rnn_cell"]
    em = params["emission_sampler"]["to_parameters"]
    t = mask.shape[1]
    lengths = jnp.sum(mask.astype(jnp.float32), axis=1)
    k_noise, _ = jax.random.split(key)
    noise_t = d.noise(k_noise, (t, B, F), h0.dtype)
    w1 = em["lin1"]["w"]
    k, h_in, m = w1.shape
    w1_flat = jnp.moveaxis(w1, 0, 1).reshape(h_in, k * m)
    w_cat = jnp.concatenate([cell["w_hh"], w1_flat], axis=1)
    return dict(
        noise=noise_t, lengths=lengths,
        w_cat=w_cat, bias=jnp.zeros((cfg.rnn_hidden_size,), jnp.float32),
        b1_flat=em["lin1"]["b"].reshape(-1),
        w2_mean=em["lin2"]["w"][0], w2_logvar=em["lin2"]["w"][1],
        b2_flat=em["lin2"]["b"].reshape(-1),
        w_ih=cell["w_ih"], h0=h0, leak=LEAK)


def test_esn_forward_matches_scan():
    cfg, params, h0, c0, mask, key = setup_esn()
    rnn_out, _, _ = dec._run_direction(
        cfg, params["rnn_cell"], params["emission_sampler"], h0, c0, mask,
        key, True, "sample")
    ki = esn_kernel_inputs(cfg, params, h0, mask, key)
    outs = decoder_pallas.rnn_decoder_loop(interpret=True, **ki)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(outs, 0, 1)),
                               np.asarray(rnn_out), rtol=2e-5, atol=2e-6)


def test_esn_gradients_match_scan():
    """Gradient parity of the leak kernel VJP vs the scan path, including
    the (1-leak) carry-through term.  The raw kernel (no decoder_apply
    stop_gradient) must agree on ALL cotangents, reservoir included."""
    cfg, params, h0, c0, mask, key = setup_esn()

    def loss_scan(cell, emsampler, h0):
        rnn_out, _, _ = dec._run_direction(cfg, cell, emsampler, h0, c0,
                                           mask, key, True, "sample")
        return jnp.sum(rnn_out * jnp.tanh(rnn_out))

    def loss_kernel(cell, emsampler, h0):
        p2 = dict(params)
        p2["rnn_cell"] = cell
        p2["emission_sampler"] = emsampler
        ki = esn_kernel_inputs(cfg, p2, h0, mask, key)
        outs = decoder_pallas.rnn_decoder_loop(interpret=True, **ki)
        rnn_out = jnp.swapaxes(outs, 0, 1)
        return jnp.sum(rnn_out * jnp.tanh(rnn_out))

    args = (params["rnn_cell"], params["emission_sampler"], h0)
    g_scan = jax.grad(loss_scan, argnums=(0, 1, 2))(*args)
    g_kern = jax.grad(loss_kernel, argnums=(0, 1, 2))(*args)
    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_k, _ = jax.tree_util.tree_flatten(g_kern)
    assert len(flat_s) == len(flat_k)
    for a, b in zip(flat_s, flat_k):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def _esn_apply_with_backend(params, cfg, feats, lengths, gt, off, *,
                            backend, loss_only=False, fused_cells=None,
                            bidirectional_key=5):
    import os

    from seq2seq_abcd_vae_tpu.utils import backend_select

    old = os.environ.get("SEQ2SEQ_RNN_BACKEND")
    old_cells = os.environ.get("SEQ2SEQ_FUSED_CELLS")
    old_esn = os.environ.get("SEQ2SEQ_ESN_KERNELS")
    os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
    os.environ["SEQ2SEQ_ESN_KERNELS"] = "1"
    if fused_cells is not None:
        os.environ["SEQ2SEQ_FUSED_CELLS"] = fused_cells
    backend_select.resolve_rnn_backend.cache_clear()
    try:
        return dec.decoder_apply(
            params, cfg, feats, lengths, T, ground_truth_out=gt,
            ground_truth_offset=off, key=jax.random.PRNGKey(bidirectional_key),
            deterministic=False, emission_mode="sample",
            loss_only=loss_only)
    finally:
        if old is None:
            del os.environ["SEQ2SEQ_RNN_BACKEND"]
        else:
            os.environ["SEQ2SEQ_RNN_BACKEND"] = old
        if old_esn is None:
            del os.environ["SEQ2SEQ_ESN_KERNELS"]
        else:
            os.environ["SEQ2SEQ_ESN_KERNELS"] = old_esn
        if fused_cells is not None:
            if old_cells is None:
                del os.environ["SEQ2SEQ_FUSED_CELLS"]
            else:
                os.environ["SEQ2SEQ_FUSED_CELLS"] = old_cells
        backend_select.resolve_rnn_backend.cache_clear()


def test_esn_dispatch_through_decoder_apply():
    cfg, params, _, _, _, _ = setup_esn()
    rng = np.random.default_rng(20)
    feats = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    lengths = jnp.asarray([T, 4, 2])
    gt = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    off = np.zeros((B, T), np.float32)
    off[np.arange(B), np.asarray(lengths) - 1] = 1.0
    off = jnp.asarray(off)

    a = _esn_apply_with_backend(params, cfg, feats, lengths, gt, off,
                                backend="scan")
    b = _esn_apply_with_backend(params, cfg, feats, lengths, gt, off,
                                backend="pallas")
    np.testing.assert_allclose(float(b.emission_loss),
                               float(a.emission_loss), rtol=1e-4)
    np.testing.assert_allclose(float(b.offset_loss),
                               float(a.offset_loss), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b.out), np.asarray(a.out),
                               rtol=2e-4, atol=2e-5)

    # reservoir stays frozen on BOTH backends (decoder_apply
    # stop_gradient; reference model.py:376,396)
    for backend in ("scan", "pallas"):
        g = jax.grad(lambda p: float(0) + _esn_apply_with_backend(
            p, cfg, feats, lengths, gt, off,
            backend=backend).emission_loss)(params)
        np.testing.assert_array_equal(np.asarray(g["rnn_cell"]["w_ih"]), 0.0)
        np.testing.assert_array_equal(np.asarray(g["rnn_cell"]["w_hh"]), 0.0)


def test_esn_fused_losses_match_scan():
    """SEQ2SEQ_FUSED_CELLS admitting ESN routes loss_only=True through
    rnn_decoder_loop_fused_losses with leak<1: losses and parameter
    gradients must match the scan path, with no dead streams."""
    cfg, params, _, _, _, _ = setup_esn()
    rng = np.random.default_rng(23)
    feats = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    lengths = jnp.asarray([T, 4, 2])
    gt = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    off = np.zeros((B, T), np.float32)
    off[np.arange(B), np.asarray(lengths) - 1] = 1.0
    off = jnp.asarray(off)

    scan_o = _esn_apply_with_backend(params, cfg, feats, lengths, gt, off,
                                     backend="scan")
    fused_o = _esn_apply_with_backend(params, cfg, feats, lengths, gt, off,
                                      backend="pallas", loss_only=True,
                                      fused_cells="GRU,RNN,ESN")
    assert fused_o.out is None
    assert fused_o.emission_params == ()
    assert fused_o.offset_weights is None
    np.testing.assert_allclose(float(fused_o.emission_loss),
                               float(scan_o.emission_loss), rtol=1e-4)
    np.testing.assert_allclose(float(fused_o.offset_loss),
                               float(scan_o.offset_loss), rtol=1e-4)

    def loss(p, backend, loss_only, cells):
        o = _esn_apply_with_backend(p, cfg, feats, lengths, gt, off,
                                    backend=backend, loss_only=loss_only,
                                    fused_cells=cells)
        return 0.37 * o.emission_loss + 0.61 * o.offset_loss

    g_scan = jax.grad(lambda p: loss(p, "scan", False, None))(params)
    g_fused = jax.grad(lambda p: loss(p, "pallas", True,
                                      "GRU,RNN,ESN"))(params)
    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_k, _ = jax.tree_util.tree_flatten(g_fused)
    assert len(flat_s) == len(flat_k)
    for a, b in zip(flat_s, flat_k):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_esn_bidirectional_backends_agree():
    """Bidirectional ESN: the forward leg may take the kernel (prefix
    mask) but the reverse leg's suffix mask must force the scan —
    decoder_apply must agree between backends."""
    cfg = DecoderConfig(output_size=F, rnn_hidden_size=H_ESN,
                        mlp_hidden_size=M, feature_size=4, rnn_type="ESN",
                        esn_leak=LEAK, bidirectional=True)
    params = dec.decoder_init(jax.random.PRNGKey(29), cfg)
    assert not np.isnan(np.asarray(params["rnn_cell"]["w_hh"])).any()
    assert not np.isnan(
        np.asarray(params["rnn_cell_reverse"]["w_hh"])).any()
    rng = np.random.default_rng(30)
    feats = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    lengths = jnp.asarray([T, 4, 2])
    gt = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    off = np.zeros((B, T), np.float32)
    off[np.arange(B), np.asarray(lengths) - 1] = 1.0
    off = jnp.asarray(off)

    a = _esn_apply_with_backend(params, cfg, feats, lengths, gt, off,
                                backend="scan")
    b = _esn_apply_with_backend(params, cfg, feats, lengths, gt, off,
                                backend="pallas")
    np.testing.assert_allclose(float(b.emission_loss),
                               float(a.emission_loss), rtol=1e-4)
    np.testing.assert_allclose(float(b.offset_loss),
                               float(a.offset_loss), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b.out), np.asarray(a.out),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(b.out_reverse),
                               np.asarray(a.out_reverse), rtol=2e-4,
                               atol=2e-5)

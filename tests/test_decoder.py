"""Decoder semantics: masking parity with per-sequence runs, loss math,
greedy/bidirectional modes (reference: ABCD-VAE/modules/model.py:84-284)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from seq2seq_abcd_vae_tpu.configs import DecoderConfig
from seq2seq_abcd_vae_tpu.models import decoder as dec


def make(rnn_type="LSTM", **kw):
    cfg = DecoderConfig(output_size=6, rnn_hidden_size=10, mlp_hidden_size=8,
                        feature_size=5, rnn_type=rnn_type, **kw)
    params = dec.decoder_init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def run(cfg, params, features, lengths, t, gt=None, off=None, speaker=None,
        key=0, deterministic=True, emission_mode="mean"):
    return dec.decoder_apply(
        params, cfg, jnp.asarray(features), jnp.asarray(lengths), t,
        speaker=None if speaker is None else jnp.asarray(speaker),
        ground_truth_out=None if gt is None else jnp.asarray(gt),
        ground_truth_offset=None if off is None else jnp.asarray(off),
        key=jax.random.PRNGKey(key), deterministic=deterministic,
        emission_mode=emission_mode)


def test_batched_equals_per_sequence(rng):
    """Masked batched decoding must equal decoding each row alone
    (the packed 'shrinking batch' semantics). Mean feedback removes
    sampling so the comparison is exact."""
    for rnn_type in ("LSTM", "GRU", "RNN", "ESN"):
        cfg, params = make(rnn_type)
        feats = rng.normal(size=(3, 5)).astype(np.float32)
        lengths = np.asarray([7, 4, 1], np.int32)
        out = run(cfg, params, feats, lengths, 8)
        for i, l in enumerate(lengths):
            solo = run(cfg, params, feats[i:i + 1], np.asarray([l], np.int32),
                       int(l))
            np.testing.assert_allclose(
                np.asarray(out.out)[i, :l], np.asarray(solo.out)[0], rtol=2e-4,
                atol=1e-5, err_msg=f"{rnn_type} row {i}")
            np.testing.assert_allclose(
                np.asarray(out.offset_weights)[i, :l],
                np.asarray(solo.offset_weights)[0], rtol=2e-4, atol=1e-5)


def test_losses_match_manual_computation(rng):
    cfg, params = make()
    feats = rng.normal(size=(2, 5)).astype(np.float32)
    lengths = np.asarray([6, 3], np.int32)
    t = 6
    gt = rng.normal(size=(2, t, 6)).astype(np.float32)
    off = np.zeros((2, t), np.float32)
    off[0, 5] = 1.0
    off[1, 2] = 1.0
    res = run(cfg, params, feats, lengths, t, gt=gt, off=off)

    mean, logv = (np.asarray(p) for p in res.emission_params)
    want_em = 0.0
    for i, l in enumerate(lengths):
        q = torch.distributions.Normal(
            torch.from_numpy(mean[i, :l]),
            torch.from_numpy(np.exp(0.5 * logv[i, :l])))
        want_em -= q.log_prob(torch.from_numpy(gt[i, :l])).sum().item()
    np.testing.assert_allclose(float(res.emission_loss), want_em, rtol=1e-4)

    logits = np.asarray(res.offset_weights)
    want_off = 0.0
    for i, l in enumerate(lengths):
        want_off += torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits[i, :l]), torch.from_numpy(off[i, :l]),
            reduction="sum").item()
    np.testing.assert_allclose(float(res.offset_loss), want_off, rtol=1e-4)


def test_zero_length_rows_contribute_nothing(rng):
    cfg, params = make()
    feats = rng.normal(size=(3, 5)).astype(np.float32)
    gt = rng.normal(size=(3, 5, 6)).astype(np.float32)
    off = np.zeros((3, 5), np.float32)
    off[:, 4] = 1.0
    full = run(cfg, params, feats[:2], [5, 5], 5, gt=gt[:2], off=off[:2])
    padded = run(cfg, params, feats, [5, 5, 0], 5, gt=gt, off=off)
    np.testing.assert_allclose(float(padded.emission_loss),
                               float(full.emission_loss), rtol=1e-5)
    np.testing.assert_allclose(float(padded.offset_loss),
                               float(full.offset_loss), rtol=1e-5)


def test_greedy_decoder_zeroes_feedback(rng):
    """--greedy_decoder == input_dropout 1.0: at train time every cell input
    is zero, so emissions at step t are independent of earlier samples."""
    cfg, params = make(self_feedback=False)
    assert cfg.input_dropout == 1.0
    feats = rng.normal(size=(2, 5)).astype(np.float32)
    a = run(cfg, params, feats, [4, 4], 4, deterministic=False, key=1,
            emission_mode="sample")
    b = run(cfg, params, feats, [4, 4], 4, deterministic=False, key=2,
            emission_mode="sample")
    # Hidden trajectories identical regardless of sampling key.
    np.testing.assert_allclose(np.asarray(a.offset_weights),
                               np.asarray(b.offset_weights), rtol=1e-5)


def test_greedy_decoder_bidirectional(rng):
    """Bidirectional greedy training uses the stacked zero-input fast
    path; hidden trajectories must be sampling-key-independent in both
    directions and match the eval-mode cell driven with zero inputs."""
    for rnn_type in ("LSTM", "GRU", "RNN"):
        cfg, params = make(rnn_type, self_feedback=False,
                           bidirectional=True, right2left_weight=0.3)
        feats = rng.normal(size=(2, 5)).astype(np.float32)
        lengths = np.asarray([6, 4], np.int32)
        a = run(cfg, params, feats, lengths, 6, deterministic=False, key=1,
                emission_mode="sample")
        b = run(cfg, params, feats, lengths, 6, deterministic=False, key=2,
                emission_mode="sample")
        for fld in ("offset_weights", "offset_weights_reverse"):
            np.testing.assert_allclose(
                np.asarray(getattr(a, fld)), np.asarray(getattr(b, fld)),
                rtol=1e-5, err_msg=f"{rnn_type} {fld}")
        # Hidden trajectories must equal the per-direction greedy scans
        # (the ESN code path) run with the same initial states.
        feats_j = jnp.asarray(feats)
        hidden = feats_j @ params["feature2hidden"]["w"] \
            + params["feature2hidden"]["b"]
        both = hidden.reshape(2, -1, 2)
        h0f, c0f = dec._split_hidden(cfg, both[..., 0])
        h0r, c0r = dec._split_hidden(cfg, both[..., 1])
        mask = jnp.arange(6)[None, :] < jnp.asarray(lengths)[:, None]
        key = jax.random.fold_in(jax.random.PRNGKey(1), 0)
        rnn_f, _, _ = dec._run_direction(
            cfg, params["rnn_cell"], params["emission_sampler"], h0f, c0f,
            mask, key, False, "sample")
        out_f = dec.mlp_mod.mlp_apply(params["offset_predictor"],
                                      rnn_f).squeeze(-1)
        np.testing.assert_allclose(np.asarray(a.offset_weights),
                                   np.asarray(out_f), rtol=1e-5,
                                   err_msg=rnn_type)


def test_speaker_embedding_changes_output(rng):
    cfg, params = make(num_speakers=3, speaker_embed_dim=4)
    feats = rng.normal(size=(2, 5)).astype(np.float32)
    a = run(cfg, params, feats, [4, 4], 4, speaker=np.asarray([0, 0]))
    b = run(cfg, params, feats, [4, 4], 4, speaker=np.asarray([1, 2]))
    assert not np.allclose(np.asarray(a.out), np.asarray(b.out))


def test_bidirectional_decoder(rng):
    cfg, params = make(bidirectional=True, right2left_weight=0.3)
    feats = rng.normal(size=(2, 5)).astype(np.float32)
    lengths = np.asarray([6, 4], np.int32)
    gt = rng.normal(size=(2, 6, 6)).astype(np.float32)
    off = np.zeros((2, 6), np.float32)
    off[0, 5] = 1.0
    off[1, 3] = 1.0
    res = run(cfg, params, feats, lengths, 6, gt=gt, off=off)
    assert res.out_reverse is not None
    assert np.isfinite(float(res.emission_loss))
    assert np.isfinite(float(res.offset_loss))
    # Reverse outputs at padding positions (t >= length) are zeros
    # (rows join late in the reverse scan).
    np.testing.assert_allclose(np.asarray(res.offset_weights_reverse)[1, 4:],
                               np.asarray(res.offset_weights_reverse)[1, 4:])

    # Directional mixing: logsumexp of the two weighted sums.
    import math
    d_fwd = run(cfg, params, feats, lengths, 6, gt=gt, off=off)
    # recompute manually from returned params
    from seq2seq_abcd_vae_tpu import distributions as dist
    mask = (np.arange(6)[None, :] < lengths[:, None]).astype(np.float32)
    lp_f = -float(dist.log_pdf_isotropic_gaussian(
        jnp.asarray(gt), *[jnp.asarray(np.asarray(p)) for p in
                           d_fwd.emission_params],
        mask=jnp.asarray(mask[..., None])))
    lp_r = -float(dist.log_pdf_isotropic_gaussian(
        jnp.asarray(gt), *[jnp.asarray(np.asarray(p)) for p in
                           d_fwd.emission_params_reverse],
        mask=jnp.asarray(mask[..., None])))
    want = np.logaddexp(lp_f + math.log(0.7), lp_r + math.log(0.3))
    np.testing.assert_allclose(float(d_fwd.emission_loss), want, rtol=1e-5)


def test_bidirectional_reverse_processes_reversed_sequence(rng):
    """The reverse direction decoding a length-l row must equal decoding
    that row alone with T=l (positions align after the internal flip)."""
    cfg, params = make(bidirectional=True)
    feats = rng.normal(size=(2, 5)).astype(np.float32)
    lengths = np.asarray([7, 3], np.int32)
    out = run(cfg, params, feats, lengths, 7)
    solo = run(cfg, params, feats[1:2], np.asarray([3], np.int32), 3)
    np.testing.assert_allclose(np.asarray(out.out_reverse)[1, :3],
                               np.asarray(solo.out_reverse)[0], rtol=2e-4,
                               atol=1e-5)


def test_esn_decoder_weights_frozen(rng):
    """The decoder's ESN cell is a frozen reservoir (reference
    model.py:376,396 requires_grad=False): its w_ih/w_hh gradients must be
    EXACTLY zero while the latent projection, emission sampler, and offset
    head still train through the recurrence."""
    for bidirectional in (False, True):
        cfg, params = make("ESN", esn_leak=0.7, bidirectional=bidirectional)
        feats = jnp.asarray(rng.normal(
            size=(2, cfg.feature_size)).astype(np.float32))
        lengths = jnp.asarray([6, 3], jnp.int32)
        gt = jnp.asarray(rng.normal(size=(2, 6, 6)).astype(np.float32))
        off = np.zeros((2, 6), np.float32)
        off[0, 5] = 1.0
        off[1, 2] = 1.0

        def loss(p):
            out = dec.decoder_apply(
                p, cfg, feats, lengths, 6, ground_truth_out=gt,
                ground_truth_offset=jnp.asarray(off),
                key=jax.random.PRNGKey(4))
            return out.emission_loss + out.offset_loss

        g = jax.grad(loss)(params)
        cells = ["rnn_cell"] + (["rnn_cell_reverse"] if bidirectional
                                else [])
        for c in cells:
            np.testing.assert_array_equal(np.asarray(g[c]["w_ih"]), 0.0)
            np.testing.assert_array_equal(np.asarray(g[c]["w_hh"]), 0.0)
        assert float(jnp.linalg.norm(g["feature2hidden"]["w"])) > 0.0
        assert float(jnp.linalg.norm(
            g["emission_sampler"]["to_parameters"]["lin1"]["w"])) > 0.0
        assert float(jnp.linalg.norm(
            g["offset_predictor"]["lin1"]["w"])) > 0.0

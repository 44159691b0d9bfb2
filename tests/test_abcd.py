"""ABCD sampler head: logits, Gumbel-Softmax, Dirichlet-Categorical KL,
temperature schedule (reference: ABCD-VAE/modules/model.py:538-673)."""

import math

import numpy as np
import torch

import jax
import jax.numpy as jnp

from seq2seq_abcd_vae_tpu.configs import ABCDSamplerConfig
from seq2seq_abcd_vae_tpu.models import abcd


def make(key=0, input_size=12, mlp=9, k=7, f=11, prior=1.0):
    cfg = ABCDSamplerConfig(input_size, mlp, k, f, prior_concentration=prior)
    params = abcd.abcd_init(jax.random.PRNGKey(key), cfg)
    return cfg, params


def torch_dirichlet_categorical_kl(shape_logits, codebook_logits, n, k,
                                   prior):
    """Independent torch oracle for the mean-field KL formula."""
    shape_logits = torch.from_numpy(shape_logits)
    logits = torch.from_numpy(codebook_logits)
    prior = torch.tensor(prior)
    post_shape = torch.softmax(shape_logits, -1)
    conc = post_shape * n + prior
    sum_conc = conc.sum()
    elp = conc.digamma() - sum_conc.digamma()
    eq_q_pi = (sum_conc.lgamma() - conc.lgamma().sum()
               + ((conc - 1.0) * elp).sum())
    eq_p_pi = ((prior * k).lgamma() - prior.lgamma() * k
               + ((prior - 1.0) * elp).sum())
    q_z = torch.softmax(logits, -1)
    log_q_z = torch.log_softmax(logits, -1)
    eq_q_z = (q_z * log_q_z).sum()
    eq_p_z = (q_z * elp[None, :]).sum()
    b = logits.shape[0]
    return ((eq_q_pi - eq_p_pi) * (b / n) + eq_q_z - eq_p_z).item()


def test_kl_matches_torch_oracle(rng):
    cfg, params = make(prior=0.7)
    logits = rng.normal(size=(5, cfg.num_categories)).astype(np.float32)
    n = 100.0
    ours = float(abcd.abcd_kl(params, cfg, jnp.asarray(logits), n))
    want = torch_dirichlet_categorical_kl(
        np.asarray(params["posterior_shape_logits"]), logits, n,
        cfg.num_categories, cfg.prior_concentration)
    np.testing.assert_allclose(ours, want, rtol=1e-4)


def test_kl_row_mask_equals_dropping_rows(rng):
    cfg, params = make()
    logits = rng.normal(size=(5, cfg.num_categories)).astype(np.float32)
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
    masked = float(abcd.abcd_kl(params, cfg, jnp.asarray(logits), 50.0,
                                row_mask=mask))
    dropped = float(abcd.abcd_kl(params, cfg, jnp.asarray(logits[:3]), 50.0))
    np.testing.assert_allclose(masked, dropped, rtol=1e-5)


def test_logits_are_scaled_codebook_attention(rng):
    cfg, params = make()
    x = rng.normal(size=(4, cfg.input_size)).astype(np.float32)
    code = np.asarray(abcd.abcd_code(params, jnp.asarray(x)))
    want = code @ np.asarray(params["codebook"]) / math.sqrt(cfg.feature_dim)
    got = np.asarray(abcd.abcd_logits(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_no_sample_uses_softmax_weights(rng):
    cfg, params = make()
    logits = rng.normal(size=(4, cfg.num_categories)).astype(np.float32)
    got = np.asarray(abcd.abcd_sample(params, jnp.asarray(logits), 1.0,
                                      no_sample=True))
    probs = torch.softmax(torch.from_numpy(logits), -1).numpy()
    want = probs @ np.asarray(params["codebook"]).T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gumbel_softmax_statistics():
    """Draws lie on the simplex; argmax frequencies follow softmax(logits)
    (the Gumbel-max property, exact for any tau); and the empirical mean
    matches torch.nn.functional.gumbel_softmax(hard=False) draws."""
    base = np.asarray([2.0, 0.0, -1.0], np.float32)
    logits = jnp.asarray(np.tile(base, (8000, 1)))
    draws = abcd.gumbel_softmax(jax.random.PRNGKey(0), logits, 1.0)
    d = np.asarray(draws)
    np.testing.assert_allclose(d.sum(-1), 1.0, atol=1e-5)
    want = np.asarray(jax.nn.softmax(jnp.asarray(base)))
    freqs = np.bincount(d.argmax(-1), minlength=3) / d.shape[0]
    np.testing.assert_allclose(freqs, want, atol=0.02)
    torch.manual_seed(0)
    t_draws = torch.nn.functional.gumbel_softmax(
        torch.from_numpy(np.tile(base, (8000, 1))), tau=1.0, dim=-1).numpy()
    np.testing.assert_allclose(d.mean(0), t_draws.mean(0), atol=0.02)


def test_low_temperature_sharpens():
    logits = jnp.zeros((2000, 5))
    hot = np.asarray(abcd.gumbel_softmax(jax.random.PRNGKey(1), logits, 1.0))
    cold = np.asarray(abcd.gumbel_softmax(jax.random.PRNGKey(1), logits, 0.1))
    assert cold.max(-1).mean() > hot.max(-1).mean()


def test_temperature_schedule():
    cfg = ABCDSamplerConfig(4, 4, 4, 4, min_temperature=1.0,
                            temperature_update_freq=1000,
                            temperature_anneal_rate=1e-5)
    # floored to multiples of update_freq (model.py:561,644-658)
    assert float(abcd.temperature_for_iter(cfg, 0)) == 1.0
    assert float(abcd.temperature_for_iter(cfg, 999)) == 1.0
    np.testing.assert_allclose(float(abcd.temperature_for_iter(cfg, 1000)),
                               math.exp(-1e-5 * 1000), rtol=1e-6)
    np.testing.assert_allclose(float(abcd.temperature_for_iter(cfg, 2500)),
                               math.exp(-1e-5 * 2000), rtol=1e-6)


def test_log_pmf_matches_torch_cross_entropy(rng):
    logits = rng.normal(size=(6, 9)).astype(np.float32)
    targets = rng.integers(0, 9, size=6)
    ours = float(abcd.abcd_log_pmf(jnp.asarray(targets), jnp.asarray(logits)))
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(targets),
        reduction="sum").item()
    np.testing.assert_allclose(ours, want, rtol=1e-5)

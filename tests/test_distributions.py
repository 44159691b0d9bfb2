"""Distribution math vs closed forms and torch.distributions."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from seq2seq_abcd_vae_tpu import distributions as dist


def test_kl_matches_torch(rng):
    mean = rng.normal(size=(4, 7)).astype(np.float32)
    logv = rng.normal(size=(4, 7)).astype(np.float32)
    ours = float(dist.kl_isotropic_to_standard_gaussian(
        jnp.asarray(mean), jnp.asarray(logv)))
    q = torch.distributions.Normal(torch.from_numpy(mean),
                                   torch.from_numpy(np.exp(0.5 * logv)))
    p = torch.distributions.Normal(0.0, 1.0)
    want = torch.distributions.kl_divergence(q, p).sum().item()
    np.testing.assert_allclose(ours, want, rtol=1e-5)


def test_log_pdf_matches_torch(rng):
    value = rng.normal(size=(4, 7)).astype(np.float32)
    mean = rng.normal(size=(4, 7)).astype(np.float32)
    logv = rng.normal(size=(4, 7)).astype(np.float32)
    ours = float(dist.log_pdf_isotropic_gaussian(
        jnp.asarray(value), jnp.asarray(mean), jnp.asarray(logv)))
    want = torch.distributions.Normal(
        torch.from_numpy(mean),
        torch.from_numpy(np.exp(0.5 * logv))).log_prob(
            torch.from_numpy(value)).sum().item()
    np.testing.assert_allclose(ours, want, rtol=1e-4)


def test_mask_zeroes_padding(rng):
    value = rng.normal(size=(3, 5)).astype(np.float32)
    mean = rng.normal(size=(3, 5)).astype(np.float32)
    logv = rng.normal(size=(3, 5)).astype(np.float32)
    mask = np.asarray([[1.0], [1.0], [0.0]], np.float32)
    full = float(dist.log_pdf_isotropic_gaussian(
        jnp.asarray(value[:2]), jnp.asarray(mean[:2]), jnp.asarray(logv[:2])))
    masked = float(dist.log_pdf_isotropic_gaussian(
        jnp.asarray(value), jnp.asarray(mean), jnp.asarray(logv),
        mask=jnp.asarray(mask)))
    np.testing.assert_allclose(masked, full, rtol=1e-5)


def test_sample_statistics():
    key = jax.random.PRNGKey(0)
    mean = jnp.full((20000,), 3.0)
    logv = jnp.full((20000,), np.log(4.0))
    s = np.asarray(dist.sample_from_isotropic_gaussian(key, mean, logv))
    np.testing.assert_allclose(s.mean(), 3.0, atol=0.05)
    np.testing.assert_allclose(s.std(), 2.0, atol=0.05)

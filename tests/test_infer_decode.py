"""Generative decode API (sampler2mean analogue, lengths-driven path)."""

import numpy as np

import jax
import jax.numpy as jnp

from seq2seq_abcd_vae_tpu.configs import (ABCDSamplerConfig, DecoderConfig,
                                          EncoderConfig)
from seq2seq_abcd_vae_tpu.infer.decode import decode_features
from seq2seq_abcd_vae_tpu.models import vae


def test_decode_features_mean_and_sample(rng):
    enc = EncoderConfig(9, 8)
    lat = ABCDSamplerConfig(enc.hidden_size_total, 8, 4, 6)
    dec = DecoderConfig(9, 8, 8, 6)
    cfg = vae.ModelConfig(enc, lat, dec)
    params = vae.model_init(jax.random.PRNGKey(0), cfg)
    feats = rng.normal(size=(3, 6)).astype(np.float32)
    lengths = jnp.asarray([5, 3, 0], jnp.int32)

    out_mean = decode_features(params, cfg, jnp.asarray(feats), lengths, 5,
                               jax.random.PRNGKey(1), emission_mode="mean")
    # mean mode: fed-back output equals the emission mean parameter
    np.testing.assert_allclose(np.asarray(out_mean.out),
                               np.asarray(out_mean.emission_params[0]),
                               rtol=1e-6)
    out_s1 = decode_features(params, cfg, jnp.asarray(feats), lengths, 5,
                             jax.random.PRNGKey(1))
    out_s2 = decode_features(params, cfg, jnp.asarray(feats), lengths, 5,
                             jax.random.PRNGKey(2))
    # sampling: reproducible per key, different across keys
    out_s1b = decode_features(params, cfg, jnp.asarray(feats), lengths, 5,
                              jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(out_s1.out),
                                  np.asarray(out_s1b.out))
    assert not np.allclose(np.asarray(out_s1.out), np.asarray(out_s2.out))
    assert out_mean.emission_loss is None and out_mean.offset_loss is None

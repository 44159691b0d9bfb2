"""Assembled seq2seq VAE: encoder -> latent head -> decoder, one loss fn.

Reproduces the reference per-batch computation (ABCD-VAE/learning.py:147-157
and plain/learning.py:144-153) for both model families:

- latent_type='abcd': ABCD head; KL uses the global train-set size N and
  the Gumbel-Softmax temperature; pretraining (`no_sample`) bypasses
  sampling;
- latent_type='gaussian': plain VAE; KL to the standard normal.

All losses are unnormalized sums; the caller divides by the number of real
sequences in the batch (learning.py:155-157).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Union

import jax
import jax.numpy as jnp

from ..configs import (ABCDSamplerConfig, DecoderConfig, EncoderConfig,
                       GaussianSamplerConfig)
from . import abcd as abcd_mod
from . import decoder as dec_mod
from . import encoder as enc_mod
from . import sampler as sampler_mod


@dataclass(frozen=True)
class ModelConfig:
    encoder: EncoderConfig
    latent: Union[ABCDSamplerConfig, GaussianSamplerConfig]
    decoder: DecoderConfig

    @property
    def latent_type(self) -> str:
        return ("abcd" if isinstance(self.latent, ABCDSamplerConfig)
                else "gaussian")


def model_init(key: jax.Array, cfg: ModelConfig) -> dict:
    k_enc, k_lat, k_dec = jax.random.split(key, 3)
    if cfg.latent_type == "abcd":
        latent = abcd_mod.abcd_init(k_lat, cfg.latent)
    else:
        latent = sampler_mod.sampler_init(k_lat, cfg.latent)
    return {
        "encoder": enc_mod.encoder_init(k_enc, cfg.encoder),
        "feature_sampler": latent,
        "decoder": dec_mod.decoder_init(k_dec, cfg.decoder),
    }


def forward_losses(params: dict, cfg: ModelConfig, *,
                   inputs: jax.Array, lengths: jax.Array,
                   speakers: jax.Array, is_offset: jax.Array,
                   key: jax.Array, entire_data_size: jax.Array | float,
                   temperature: jax.Array | float = 1.0,
                   no_sample: bool = False,
                   deterministic: bool = False) -> dict[str, Any]:
    """One full forward pass returning the three unnormalized loss sums and
    diagnostics.

    inputs: (B, T, F) padded log-spectrograms; lengths: (B,) frame counts
    (0 marks batch-padding rows); is_offset: (B, T) end flags.
    """
    k_enc, k_lat, k_dec = jax.random.split(key, 3)
    row_mask = (lengths > 0).astype(inputs.dtype)

    last_hidden = enc_mod.encoder_apply(
        params["encoder"], cfg.encoder, inputs, lengths,
        dropout_key=k_enc, deterministic=deterministic)

    if cfg.latent_type == "abcd":
        logits = abcd_mod.abcd_logits(params["feature_sampler"], last_hidden)
        features = abcd_mod.abcd_sample(params["feature_sampler"], logits,
                                        temperature, key=k_lat,
                                        no_sample=no_sample)
        kl = abcd_mod.abcd_kl(params["feature_sampler"], cfg.latent, logits,
                              entire_data_size, row_mask=row_mask)
        latent_info = {"category_logits": logits}
    else:
        feat_params = sampler_mod.sampler_apply(params["feature_sampler"],
                                                last_hidden)
        feat_params = tuple(p * row_mask[:, None] for p in feat_params)
        features = sampler_mod.sampler_sample(
            k_lat, feat_params, cfg.latent.distribution_name)
        kl = sampler_mod.sampler_kl(feat_params,
                                    cfg.latent.distribution_name,
                                    mask=row_mask[:, None])
        latent_info = {"feature_parameters": feat_params}

    dec_out = dec_mod.decoder_apply(
        params["decoder"], cfg.decoder, features, lengths, inputs.shape[1],
        speaker=speakers, ground_truth_out=inputs,
        ground_truth_offset=is_offset, key=k_dec,
        deterministic=deterministic,
        # only the loss sums are consumed below — permits the fused
        # in-kernel NLL fast path (models/decoder.py)
        loss_only=True)

    return {
        "emission_loss": dec_out.emission_loss,
        "offset_loss": dec_out.offset_loss,
        "kl_loss": kl,
        "num_rows": jnp.sum(row_mask),
        **latent_info,
    }


def training_loss(params: dict, cfg: ModelConfig, batch: dict,
                  key: jax.Array, entire_data_size,
                  temperature=1.0, no_sample: bool = False,
                  deterministic: bool = False):
    """Scalar loss = (emission + offset + KL) / batch_size
    (reference: learning.py:155-157), plus the aux dict."""
    out = forward_losses(params, cfg, inputs=batch["inputs"],
                         lengths=batch["lengths"], speakers=batch["speakers"],
                         is_offset=batch["is_offset"], key=key,
                         entire_data_size=entire_data_size,
                         temperature=temperature, no_sample=no_sample,
                         deterministic=deterministic)
    total = (out["emission_loss"] + out["offset_loss"] + out["kl_loss"])
    return total / out["num_rows"], out

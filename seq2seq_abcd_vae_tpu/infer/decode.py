"""Post-training decoding: reconstruct / generate spectrograms from
latents.

The reference decoder supports a post-training path driven by ``lengths``
instead of packed batch_sizes (model.py:152-154) and a mean-decoding
switch ``sampler2mean``/``mean2sampler`` (model.py:272-284) that no entry
script uses but downstream analyses do.  This module exposes both over
the padded/masked decoder.
"""

from __future__ import annotations

import functools

import jax

from ..models import decoder as dec_mod
from ..models.vae import ModelConfig


@functools.partial(jax.jit, static_argnames=("cfg", "total_steps",
                                             "emission_mode"))
def decode_features(params: dict, cfg: ModelConfig, features: jax.Array,
                    lengths: jax.Array, total_steps: int,
                    key: jax.Array, speaker: jax.Array | None = None,
                    emission_mode: str = "sample"):
    """Run the decoder generatively from latent features.

    emission_mode='mean' reproduces sampler2mean(mean_ix=0): the emission
    mean is fed back and returned instead of a stochastic sample.

    Returns the DecoderOutput with (B, T, F) arrays; positions at or past
    ``lengths`` are padding.
    """
    return dec_mod.decoder_apply(
        params["decoder"], cfg.decoder, features, lengths, total_steps,
        speaker=speaker, key=key, deterministic=True,
        emission_mode=emission_mode)

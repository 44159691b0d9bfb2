"""ABCD latent head: "A"ttention-"B"ased "C"ategorical sampler with a
"D"irichlet prior (Gumbel-Softmax over a K-way codebook).

Reference: ABCDSampler, ABCD-VAE/modules/model.py:538-673.
- logits = MLP(x) @ codebook / sqrt(feature_dim)  (:581-590)
- sample = GumbelSoftmax(logits, tau) @ codebook^T, or plain softmax when
  no_sample=True during pretraining  (:592-606)
- mean-field Dirichlet-Categorical KL with a learnable global
  posterior-shape parameter  (:608-639)
- tau schedule: min(min_temperature, exp(-anneal_rate * steps)) where
  steps is the iteration count floored to temperature_update_freq
  (:644-658); a pure function of the persisted counter here.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

from ..configs import ABCDSamplerConfig
from . import initializers as init
from . import mlp as mlp_mod


def abcd_init(key: jax.Array, cfg: ABCDSamplerConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "to_code_like": mlp_mod.mlp_init(k1, cfg.input_size,
                                         cfg.mlp_hidden_size, cfg.feature_dim),
        "posterior_shape_logits": init.normal_params(k2,
                                                     (cfg.num_categories,)),
        "codebook": init.normal_params(k3, (cfg.feature_dim,
                                            cfg.num_categories)),
    }


def abcd_code(params: dict, x: jax.Array) -> jax.Array:
    """Pre-logit feature vector (encode_features.py:31)."""
    return mlp_mod.mlp_apply(params["to_code_like"], x)


def abcd_logits(params: dict, x: jax.Array) -> jax.Array:
    """Unnormalized log posterior over categories: scaled dot-product
    attention of the transformed input against the codebook."""
    code = abcd_code(params, x)
    scale = 1.0 / math.sqrt(code.shape[-1])
    return (code @ params["codebook"]) * scale


def gumbel_softmax(key: jax.Array, logits: jax.Array,
                   temperature: jax.Array | float) -> jax.Array:
    """Soft Gumbel-Softmax sample (parity with torch F.gumbel_softmax
    hard=False): softmax((logits + Gumbel noise) / tau)."""
    g = jax.random.gumbel(key, logits.shape, logits.dtype)
    return jax.nn.softmax((logits + g) / temperature, axis=-1)


def abcd_sample(params: dict, logits: jax.Array,
                temperature: jax.Array | float,
                key: jax.Array | None = None,
                no_sample: bool = False) -> jax.Array:
    """Latent feature = (soft one-hot) @ codebook^T — the weighted sum of
    codebook columns (cf. VQ-VAE). no_sample=True uses the posterior
    probabilities directly (pretraining, model.py:592-606)."""
    if no_sample:
        weights = jax.nn.softmax(logits, axis=-1)
    else:
        weights = gumbel_softmax(key, logits, temperature)
    return weights @ params["codebook"].T


def abcd_kl(params: dict, cfg: ABCDSamplerConfig, logits: jax.Array,
            entire_data_size: jax.Array | float,
            row_mask: jax.Array | None = None) -> jax.Array:
    """KL( q(pi) q(z|x) || p(pi) p(z|pi) ), mean-field Dirichlet-Categorical
    (model.py:608-639).  ``entire_data_size`` is the *global* dataset size
    N, a replicated scalar (SURVEY.md section 2.4).  ``row_mask`` excludes
    batch-padding rows from the per-datum terms and the batch_size count.
    """
    prior_conc = jnp.asarray(cfg.prior_concentration, logits.dtype)
    k = cfg.num_categories

    posterior_shape = jax.nn.softmax(params["posterior_shape_logits"], -1)
    posterior_conc = posterior_shape * entire_data_size + prior_conc
    sum_conc = jnp.sum(posterior_conc)
    expected_log_pi = digamma(posterior_conc) - digamma(sum_conc)
    eq_log_q_pi = (gammaln(sum_conc) - jnp.sum(gammaln(posterior_conc))
                   + jnp.sum((posterior_conc - 1.0) * expected_log_pi))
    eq_log_p_pi = (gammaln(prior_conc * k) - gammaln(prior_conc) * k
                   + jnp.sum((prior_conc - 1.0) * expected_log_pi))

    q_z = jax.nn.softmax(logits, -1)
    log_q_z = jax.nn.log_softmax(logits, -1)
    per_row_q = jnp.sum(q_z * log_q_z, axis=-1)
    per_row_p = q_z @ expected_log_pi
    if row_mask is not None:
        per_row_q = per_row_q * row_mask
        per_row_p = per_row_p * row_mask
        batch_size = jnp.sum(row_mask)
    else:
        batch_size = logits.shape[0]
    eq_log_q_z = jnp.sum(per_row_q)
    eq_log_p_z = jnp.sum(per_row_p)

    return ((eq_log_q_pi - eq_log_p_pi) * (batch_size / entire_data_size)
            + eq_log_q_z - eq_log_p_z)


def abcd_log_pmf(targets: jax.Array, logits: jax.Array) -> jax.Array:
    """Sum-reduced cross entropy (supervised hook, model.py:641-642)."""
    log_probs = jax.nn.log_softmax(logits, -1)
    picked = jnp.take_along_axis(log_probs, targets[:, None], axis=-1)
    return -jnp.sum(picked)


def temperature_for_iter(cfg: ABCDSamplerConfig,
                         iter_counts: int | jax.Array):
    """tau as a pure function of the persisted iteration counter.

    The reference recomputes tau only every ``temperature_update_freq``
    iterations (model.py:644-658), i.e. the effective step count is
    floored to a multiple of the update frequency.

    Host ints stay host floats (the training loop calls this every batch;
    a device round-trip here would stall the dispatch pipeline).
    """
    steps = (iter_counts // cfg.temperature_update_freq
             ) * cfg.temperature_update_freq
    if isinstance(steps, (int, float)):
        return min(cfg.min_temperature,
                   math.exp(-cfg.temperature_anneal_rate * steps))
    return jnp.minimum(cfg.min_temperature,
                       jnp.exp(-cfg.temperature_anneal_rate * steps))

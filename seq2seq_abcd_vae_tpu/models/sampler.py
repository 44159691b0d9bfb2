"""Generic distribution-parameterizing sampler head.

Reference: Sampler, ABCD-VAE/modules/model.py:676-706 (and
plain/modules/model.py:538-568 where it serves as the latent head of the
plain Gaussian VAE).  An MLP_To_k_Vecs produces the k distribution
parameters (k=2 for isotropic Gaussian: mean, log_variance); sampling,
log-pdf and KL dispatch through the distribution registry.
"""

from __future__ import annotations

import jax

from .. import distributions as dist
from ..configs import GaussianSamplerConfig
from . import mlp as mlp_mod


def sampler_init(key: jax.Array, cfg: GaussianSamplerConfig) -> dict:
    d = dist.choose_distribution(cfg.distribution_name)
    return {"to_parameters": mlp_mod.mlp_k_init(
        key, cfg.input_size, cfg.mlp_hidden_size, cfg.output_size,
        d.num_parameters)}


def sampler_apply(params: dict, x: jax.Array) -> tuple[jax.Array, ...]:
    """x -> distribution parameter tuple (e.g. (mean, log_variance))."""
    return mlp_mod.mlp_k_apply(params["to_parameters"], x)


def sampler_sample(key: jax.Array, parameters: tuple,
                   distribution_name: str) -> jax.Array:
    return dist.choose_distribution(distribution_name).sample(key, *parameters)


def sampler_kl(parameters: tuple, distribution_name: str,
               mask: jax.Array | None = None) -> jax.Array:
    return dist.choose_distribution(distribution_name).kl_to_standard(
        *parameters, mask=mask)


def sampler_log_pdf(samples: jax.Array, parameters: tuple,
                    distribution_name: str,
                    mask: jax.Array | None = None) -> jax.Array:
    return dist.choose_distribution(distribution_name).log_pdf(
        samples, *parameters, mask=mask)

"""Distribution registry for latent/emission noise models.

Mirrors the reference registry (ABCD-VAE/modules/model.py:6-37): each entry
maps a name to ``(sample, log_pdf, kl_to_standard, num_parameters)``.  All
reductions are *unnormalized sums* over every element, matching the
reference's packed-data loss semantics; callers that work with padded
arrays pass an optional ``mask`` broadcastable against the value so that
padding contributes exactly zero.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def sample_from_isotropic_gaussian(key: jax.Array, mean: jax.Array,
                                   log_variance: jax.Array) -> jax.Array:
    """Reparameterized draw ``mean + exp(0.5*logvar) * eps``
    (reference: ABCD-VAE/modules/model.py:17-19)."""
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + jnp.exp(0.5 * log_variance) * eps


def kl_isotropic_to_standard_gaussian(mean: jax.Array, log_variance: jax.Array,
                                      mask: jax.Array | None = None) -> jax.Array:
    """Sum-reduced KL( N(mean, diag exp(logvar)) || N(0, I) )
    (reference: ABCD-VAE/modules/model.py:21-28)."""
    kl = -0.5 * (1.0 + log_variance - jnp.square(mean) - jnp.exp(log_variance))
    if mask is not None:
        kl = kl * mask
    return jnp.sum(kl)


def log_pdf_isotropic_gaussian(value: jax.Array, mean: jax.Array,
                               log_variance: jax.Array,
                               mask: jax.Array | None = None) -> jax.Array:
    """Sum-reduced diagonal-Gaussian log density
    (reference: ABCD-VAE/modules/model.py:30-37)."""
    diff = value - mean
    ll = -0.5 * (_LOG_2PI + log_variance
                 + diff * jnp.exp(-log_variance) * diff)
    if mask is not None:
        ll = ll * mask
    return jnp.sum(ll)


def _use_fast_rng() -> bool:
    import os
    return os.environ.get("SEQ2SEQ_FAST_RNG", "") == "1"


def gaussian_noise(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Standard normals; the decoder presamples (T, B, F) of these.

    ``SEQ2SEQ_FAST_RNG=1`` switches the bit source from threefry to the
    'rbg' PRNG (XLA RngBitGenerator — the TPU's hardware RNG path): the
    round-3 device trace priced the threefry draw of the publication
    shape's 17M normals at 1.1 ms/step.  Opt-in because rbg bit streams
    are backend-specific: same-seed runs stay reproducible on one
    platform but CPU and TPU runs of the same seed diverge (threefry,
    the default, is bit-identical everywhere).  Key derivation still
    flows from the caller's threefry key, so seeds/splits behave
    identically.
    """
    if _use_fast_rng():
        data = jax.random.key_data(key)  # (2,) uint32 threefry key
        rbg = jax.random.wrap_key_data(
            jnp.tile(data.astype(jnp.uint32), 2), impl="rbg")
        return jax.random.normal(rbg, shape, dtype)
    return jax.random.normal(key, shape, dtype)


def gaussian_from_noise(noise: jax.Array, mean: jax.Array,
                        log_variance: jax.Array) -> jax.Array:
    """Reparameterization with externally supplied standard noise.

    Lets callers presample all noise in one RNG call outside a scan
    (per-step threefry inside lax.scan dominates small-step runtimes on
    TPU); statistically identical to ``sample``."""
    return mean + jnp.exp(0.5 * log_variance) * noise


class Distribution(NamedTuple):
    sample: Callable[..., jax.Array]
    log_pdf: Callable[..., jax.Array]
    kl_to_standard: Callable[..., jax.Array]
    num_parameters: int
    noise: Callable[..., jax.Array]
    from_noise: Callable[..., jax.Array]


_REGISTRY: dict[str, Distribution] = {
    "isotropic_gaussian": Distribution(
        sample=sample_from_isotropic_gaussian,
        log_pdf=log_pdf_isotropic_gaussian,
        kl_to_standard=kl_isotropic_to_standard_gaussian,
        num_parameters=2,
        noise=gaussian_noise,
        from_noise=gaussian_from_noise,
    ),
}


def choose_distribution(distribution_name: str) -> Distribution:
    """Name -> Distribution (reference: ABCD-VAE/modules/model.py:6-15)."""
    return _REGISTRY[distribution_name]


def register_distribution(name: str, dist: Distribution) -> None:
    """Extension hook: the reference hard-codes its registry; we allow users
    to add new noise models without forking."""
    _REGISTRY[name] = dist

"""MLP (Linear -> Tanh -> Linear) and MLP_To_k_Vecs.

Reference: ABCD-VAE/modules/model.py:316-334 (MLP) and :303-314
(MLP_To_k_Vecs, k parallel MLPs producing k parameter vectors).

TPU note: the k parallel MLPs are stored stacked along a leading axis and
applied with one batched einsum each layer, so the emission head inside
the decoder scan is two fused matmuls instead of 2k small ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import initializers as init


def mlp_init(key: jax.Array, input_size: int, hidden_size: int,
             output_size: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "lin1": init.linear_params(k1, input_size, hidden_size),
        "lin2": init.linear_params(k2, hidden_size, output_size),
    }


def mlp_apply(params: dict, x: jax.Array) -> jax.Array:
    h = jnp.tanh(x @ params["lin1"]["w"] + params["lin1"]["b"])
    return h @ params["lin2"]["w"] + params["lin2"]["b"]


def mlp_k_init(key: jax.Array, input_size: int, hidden_size: int,
               output_size: int, k: int) -> dict:
    """k parallel MLPs, parameters stacked on axis 0."""
    keys = jax.random.split(key, k)
    stacked = jax.vmap(
        lambda kk: mlp_init(kk, input_size, hidden_size, output_size))(keys)
    return stacked


def mlp_k_apply(params: dict, x: jax.Array) -> tuple[jax.Array, ...]:
    """x (..., in) -> tuple of k arrays (..., out)."""
    # (..., in) x (k, in, hid) -> (k, ..., hid)
    h = jnp.tanh(jnp.einsum("...i,kih->k...h", x, params["lin1"]["w"])
                 + _expand(params["lin1"]["b"], x.ndim))
    out = (jnp.einsum("k...h,kho->k...o", h, params["lin2"]["w"])
           + _expand(params["lin2"]["b"], x.ndim))
    return tuple(out[i] for i in range(out.shape[0]))


def _expand(b: jax.Array, x_ndim: int) -> jax.Array:
    # (k, out) -> (k, 1...1, out) broadcastable against (k, ..., out)
    return b.reshape(b.shape[0], *([1] * (x_ndim - 1)), b.shape[1])

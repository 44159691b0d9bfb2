"""Weight initializers replicating the reference's PyTorch distributions.

Bit-parity across frameworks is impossible (different RNG), but matching
the *distributions* is required for matching ELBO curves (SURVEY.md hard
part #4):
- torch.nn.Linear: W, b ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in))
- torch.nn.{LSTM,GRU,RNN}{,Cell}: all tensors ~ U(-1/sqrt(hidden), ...)
- torch.nn.Embedding / raw Parameters: N(0, 1)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def uniform_fan(key: jax.Array, shape: tuple[int, ...], fan: int,
                dtype=jnp.float32) -> jax.Array:
    bound = 1.0 / math.sqrt(fan)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_params(key: jax.Array, in_size: int, out_size: int,
                  dtype=jnp.float32) -> dict:
    """Linear layer stored as (in, out) so application is ``x @ w + b``."""
    kw, kb = jax.random.split(key)
    return {
        "w": uniform_fan(kw, (in_size, out_size), in_size, dtype),
        "b": uniform_fan(kb, (out_size,), in_size, dtype),
    }


def rnn_gate_params(key: jax.Array, in_size: int, hidden: int,
                    num_gates: int, dtype=jnp.float32) -> dict:
    """One recurrent layer's tensors, U(+-1/sqrt(hidden)) like torch RNNs.

    Stored transposed relative to torch — (in, gates*hidden) — so that the
    per-step compute is a row-major ``x @ w`` matmul on the MXU.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    g = num_gates * hidden
    return {
        "w_ih": uniform_fan(k1, (in_size, g), hidden, dtype),
        "w_hh": uniform_fan(k2, (hidden, g), hidden, dtype),
        "b_ih": uniform_fan(k3, (g,), hidden, dtype),
        "b_hh": uniform_fan(k4, (g,), hidden, dtype),
    }


def normal_params(key: jax.Array, shape: tuple[int, ...],
                  dtype=jnp.float32) -> jax.Array:
    return jax.random.normal(key, shape, dtype)

"""Echo-State Network encoder / cell (fixed, non-trainable weights).

Reference: ABCD-VAE/modules/model.py:336-535 (``ESN`` full-sequence module
and ``ESNCell``).  Weight construction parity:

- input->hidden entries are +-3/q with q = binom.ppf(0.95, fan_in, 0.5)
  (model.py:362-388,495-504);
- hidden->hidden is randn sparsified by a train-mode Dropout(p=1-sparsity)
  — i.e. kept entries are scaled by 1/sparsity — then normalized so its
  spectral radius is 0.99 (model.py:390-401,510-518);
- update: h' = (1-leak) h + leak * tanh(W_ih x + W_hh h), no biases
  (model.py:444,529-531).

Spectral radius is computed host-side with numpy at init (one-time), the
TPU equivalent of the reference's ``torch.eig`` call.  The hidden matrix is
kept dense: at these sizes a dense (H,H) MXU matmul beats sparse forms.

ESN weights are FROZEN (reference model.py:376,396: ``requires_grad=False``):
``run_esn_layer``/``esn_step`` wrap them in ``lax.stop_gradient`` so SGD
never updates the reservoir (gradients are exactly zero, which also keeps
the global-norm clip identical to torch, where frozen params simply don't
participate).  The decoder's ESN cell is frozen the same way in
models/decoder.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as spstats


def _input_weight(key: jax.Array, fan_in: int, hidden: int,
                  q: float) -> jax.Array:
    """(fan_in, hidden) matrix of +-3/quantile entries (stored transposed
    relative to torch for row-major x @ W)."""
    quantile = float(spstats.binom.ppf(q, fan_in, 0.5))
    bits = jax.random.randint(key, (fan_in, hidden), 0, 2).astype(jnp.float32)
    return bits * (6.0 / quantile) - (3.0 / quantile)


def _hidden_weight(key: jax.Array, hidden: int, sparsity: float) -> jax.Array:
    k1, k2 = jax.random.split(key)
    w = jax.random.normal(k1, (hidden, hidden), jnp.float32)
    keep = jax.random.bernoulli(k2, sparsity, (hidden, hidden))
    w = jnp.where(keep, w / sparsity, 0.0)  # train-mode dropout scaling
    radius = float(np.abs(np.linalg.eigvals(np.asarray(w))).max())
    return w / (radius / 0.99)


def esn_layer_init(key: jax.Array, fan_in: int, hidden: int,
                   q: float = 0.95, sparsity: float = 0.1) -> dict:
    k1, k2 = jax.random.split(key)
    return {"w_ih": _input_weight(k1, fan_in, hidden, q),
            "w_hh": _hidden_weight(k2, hidden, sparsity)}


def esn_init(key: jax.Array, input_size: int, hidden_size: int,
             num_layers: int, bidirectional: bool,
             q: float = 0.95, sparsity: float = 0.1) -> dict:
    """Full-sequence ESN parameters: layers x directions."""
    internal = hidden_size * (2 if bidirectional else 1)
    layers = []
    for l in range(num_layers):
        fan_in = input_size if l == 0 else internal
        key, kf, kb = jax.random.split(key, 3)
        entry = {"fwd": esn_layer_init(kf, fan_in, hidden_size, q, sparsity)}
        if bidirectional:
            entry["bwd"] = esn_layer_init(kb, fan_in, hidden_size, q, sparsity)
        layers.append(entry)
    return {"layers": layers}


def esn_step(params: dict, x: jax.Array, h: jax.Array,
             leak: float) -> jax.Array:
    w_ih = jax.lax.stop_gradient(params["w_ih"])
    w_hh = jax.lax.stop_gradient(params["w_hh"])
    update = jnp.tanh(x @ w_ih + h @ w_hh)
    return (1.0 - leak) * h + leak * update


def run_esn_layer(params: dict, x: jax.Array, mask: jax.Array, leak: float,
                  reverse: bool = False):
    """Masked scan of one ESN direction; mirrors rnn.run_rnn_layer.

    The reservoir weights are frozen (stop_gradient; model.py:376,396
    ``requires_grad=False``) — gradients still flow to the INPUT x, which
    is a lower layer's trainable output for stacked ESNs.
    """
    b, t, _ = x.shape
    hidden = params["w_hh"].shape[0]
    w_ih = jax.lax.stop_gradient(params["w_ih"])
    w_hh = jax.lax.stop_gradient(params["w_hh"])
    xp = x @ w_ih  # hoisted input matmul (model.py:430)
    xp_t = jnp.swapaxes(xp, 0, 1)
    mask_t = jnp.swapaxes(mask, 0, 1)[..., None]
    h0 = jnp.zeros((b, hidden), x.dtype)

    def step(h, inp):
        xpt, mt = inp
        h2 = (1.0 - leak) * h + leak * jnp.tanh(xpt + h @ w_hh)
        h = jnp.where(mt, h2, h)
        return h, h

    from .rnn import SCAN_UNROLL
    h_n, outs = jax.lax.scan(step, h0, (xp_t, mask_t), reverse=reverse,
                             unroll=SCAN_UNROLL)
    return jnp.swapaxes(outs, 0, 1), h_n

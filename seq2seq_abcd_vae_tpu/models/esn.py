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


def kernels_enabled() -> bool:
    """Admit the leak-generalized Elman Pallas kernels for ESN paths.

    Default ON since the on-hardware parity rows landed in
    PROFILE_r04.json (v5e, 2026-08-19): encoder uni/bidir outputs
    bit-equal to scan with input-grad diffs 4.1e-5 / 1e-8 and exactly
    zero reservoir grads (scripts/pallas_grad_parity.py ESN rows);
    decoder loop loss diff 0.0, grad_rel 6.8e-7, fused-loss path
    1.21e-6 (scripts/decoder_kernel_parity.py).  Set
    SEQ2SEQ_ESN_KERNELS=0 to force the scan path for A/B probes.
    """
    import os
    return os.environ.get("SEQ2SEQ_ESN_KERNELS", "1") == "1"


def esn_step(params: dict, x: jax.Array, h: jax.Array,
             leak: float) -> jax.Array:
    w_ih = jax.lax.stop_gradient(params["w_ih"])
    w_hh = jax.lax.stop_gradient(params["w_hh"])
    update = jnp.tanh(x @ w_ih + h @ w_hh)
    return (1.0 - leak) * h + leak * update


def run_esn_layer(params: dict, x: jax.Array, mask: jax.Array, leak: float,
                  reverse: bool = False):
    """Masked scan of one ESN direction; mirrors rnn.run_rnn_layer,
    including its whole-loop Pallas kernel dispatch (the Elman layer
    kernel generalized with the static ``leak``, zero biases).

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
    from . import rnn as rnn_mod
    if rnn_mod.resolved_backend() == "pallas" and kernels_enabled():
        from ..ops import elman_pallas
        lengths = jnp.sum(mask.astype(jnp.float32), axis=1)
        interpret = jax.default_backend() != "tpu"
        if reverse:
            xp_t = jnp.flip(xp_t, 0)
        outs, h_n = elman_pallas.rnn_layer(
            xp_t, lengths, w_hh, jnp.zeros((hidden,), x.dtype),
            interpret=interpret, precision=rnn_mod.kernel_precision(),
            reverse=reverse, leak=leak)
        if reverse:
            outs = jnp.flip(outs, 0)
        return jnp.swapaxes(outs, 0, 1), h_n
    mask_t = jnp.swapaxes(mask, 0, 1)[..., None]
    h0 = jnp.zeros((b, hidden), x.dtype)

    def step(h, inp):
        xpt, mt = inp
        h2 = (1.0 - leak) * h + leak * jnp.tanh(xpt + h @ w_hh)
        h = jnp.where(mt, h2, h)
        return h, h

    h_n, outs = jax.lax.scan(step, h0, (xp_t, mask_t), reverse=reverse,
                             unroll=rnn_mod.SCAN_UNROLL)
    return jnp.swapaxes(outs, 0, 1), h_n


def run_esn_layer_bidir(params_fwd: dict, params_bwd: dict, x: jax.Array,
                        mask: jax.Array, leak: float):
    """Both ESN directions of one layer; takes the fully fused
    bidirectional Elman kernel (input projection in-kernel, leak static,
    zero biases) when the measured backend is pallas, else two masked
    scans.  Mirrors rnn.run_rnn_layer_bidir's dispatch incl. the
    SEQ2SEQ_ENCODER_BACKEND override.

    Returns (outs_fwd (B,T,H), outs_bwd (B,T,H), h_n_fwd, h_n_bwd).
    """
    import os

    from . import rnn as rnn_mod
    enc_backend = os.environ.get("SEQ2SEQ_ENCODER_BACKEND", "auto")
    if kernels_enabled() and (
            enc_backend == "pallas" or (enc_backend == "auto"
                                        and rnn_mod.resolved_backend()
                                        == "pallas")):
        from ..ops import elman_pallas
        hidden = params_fwd["w_hh"].shape[0]
        w_ih = jax.lax.stop_gradient(
            jnp.stack([params_fwd["w_ih"], params_bwd["w_ih"]]))
        w_hh = jax.lax.stop_gradient(
            jnp.stack([params_fwd["w_hh"], params_bwd["w_hh"]]))
        zeros2 = jnp.zeros((2, hidden), x.dtype)
        lengths = jnp.sum(mask.astype(jnp.float32), axis=1)
        outs, h_n = elman_pallas.rnn_layer_bidir_fused(
            jnp.swapaxes(x, 0, 1), lengths, w_ih, zeros2, w_hh, zeros2,
            interpret=jax.default_backend() != "tpu",
            precision=rnn_mod.kernel_precision(), leak=leak)
        outs_f = jnp.swapaxes(outs[:, 0], 0, 1)
        outs_b = jnp.swapaxes(jnp.flip(outs[:, 1], 0), 0, 1)
        return outs_f, outs_b, h_n[0], h_n[1]
    outs_f, h_f = run_esn_layer(params_fwd, x, mask, leak)
    outs_b, h_b = run_esn_layer(params_bwd, x, mask, leak, reverse=True)
    return outs_f, outs_b, h_f, h_b

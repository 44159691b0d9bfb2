"""Recurrent cells and masked sequence scans (LSTM / GRU / Elman RNN).

TPU-first replacement for the reference's cuDNN packed-sequence RNNs
(reference: ABCD-VAE/modules/model.py:53,60-66,287-300):

- variable lengths are handled with *padded arrays + boolean masks* instead
  of PackedSequence: each batch compiles to one static-shaped XLA program,
  and carries are frozen (``where(mask, new, old)``) once a row ends, which
  reproduces the packed "shrinking batch" semantics exactly;
- the input projection ``x @ W_ih`` for a whole sequence is hoisted out of
  the scan into one large MXU matmul; only the recurrent (B,H)x(H,GH)
  matmul stays inside ``lax.scan``;
- the reverse direction is the same scan with ``reverse=True``; masking
  makes short rows join late, matching packed bidirectional behavior.

Gate orders follow torch: LSTM (i,f,g,o), GRU (r,z,n).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

NUM_GATES = {"LSTM": 4, "GRU": 3, "RNN": 1}

# Unrolling the time scan amortizes XLA while-loop overhead across the
# many small per-step matmuls (~14% step time on v5e at unroll=4);
# override with SEQ2SEQ_SCAN_UNROLL.
SCAN_UNROLL = int(os.environ.get("SEQ2SEQ_SCAN_UNROLL", "4"))

# Full-layer recurrence backend: 'scan' (lax.scan), 'pallas'
# (ops/{lstm,gru,elman}_pallas.py — whole time loop in one kernel,
# weights pinned in VMEM; all three trainable cells), or 'auto'
# (default: measure one pallas_call dispatch and pick; see
# utils/backend_select.py).


def resolved_backend() -> str:
    from ..utils.backend_select import resolve_rnn_backend
    return resolve_rnn_backend()


def kernel_precision():
    """MXU precision for Pallas kernel dots, honoring the session's
    jax_default_matmul_precision (the CLI's --matmul_precision, default
    'highest' for reference parity): Pallas bypasses the global config,
    so the dispatch threads it explicitly.

    SEQ2SEQ_KERNEL_MXU=bf16 opts non-'highest' sessions into one-pass
    bf16 operands with f32 accumulation (ops/mxu.py) — the measured A/B
    for this lever lives in BASELINE.md; 'highest' always stays f32."""
    prec = jax.config.jax_default_matmul_precision
    if prec in ("highest", "float32"):
        return jax.lax.Precision.HIGHEST
    if os.environ.get("SEQ2SEQ_KERNEL_MXU") == "bf16":
        return "bf16"
    return None


# ---------------------------------------------------------------------------
# Single-step cells. `x_proj` is x @ w_ih + b_ih, possibly precomputed.
# ---------------------------------------------------------------------------

def lstm_step(params: dict, x_proj: jax.Array, h: jax.Array,
              c: jax.Array) -> tuple[jax.Array, jax.Array]:
    gates = x_proj + h @ params["w_hh"] + params["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
    return h2, c2


def gru_step(params: dict, x_proj: jax.Array, h: jax.Array) -> jax.Array:
    hp = h @ params["w_hh"] + params["b_hh"]
    xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
    hr, hz, hn = jnp.split(hp, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)  # torch applies r to (W_hn h + b_hn)
    return (1.0 - z) * n + z * h


def rnn_step(params: dict, x_proj: jax.Array, h: jax.Array) -> jax.Array:
    return jnp.tanh(x_proj + h @ params["w_hh"] + params["b_hh"])


def input_proj(params: dict, x: jax.Array) -> jax.Array:
    """x (..., in) -> (..., gates*hidden); the hoisted MXU matmul."""
    return x @ params["w_ih"] + params["b_ih"]


def cell_apply(rnn_type: str, params: dict, x: jax.Array,
               state: tuple[jax.Array, jax.Array]):
    """Full cell step from raw input (decoder feedback path).

    state is always an (h, c) pair; c is unused/zero for GRU/RNN so the
    decoder scan has one uniform carry structure.
    """
    xp = input_proj(params, x)
    h, c = state
    if rnn_type == "LSTM":
        return lstm_step(params, xp, h, c)
    if rnn_type == "GRU":
        h2 = gru_step(params, xp, h)
    elif rnn_type == "RNN":
        h2 = rnn_step(params, xp, h)
    else:
        raise ValueError(f"unknown rnn_type {rnn_type}")
    return h2, c


# ---------------------------------------------------------------------------
# Masked full-sequence layer scan
# ---------------------------------------------------------------------------

def run_rnn_layer(rnn_type: str, params: dict, x: jax.Array, mask: jax.Array,
                  reverse: bool = False):
    """One direction of one recurrent layer over a padded batch.

    Args:
      x: (B, T, in) inputs.
      mask: (B, T) validity; True while t < length.
      reverse: scan t = T-1 .. 0 (right-to-left direction).

    Returns:
      outputs (B, T, H) — hidden state produced *at* each position (zeros
        before a row joins in reverse; frozen after it ends in forward),
      final (h, c): state after the row's last processed position, which
        under masking equals the packed-sequence final state. c is zeros
        for GRU/RNN.
    """
    b, t, _ = x.shape
    hidden = params["w_hh"].shape[0]
    xp = input_proj(params, x)  # (B, T, G) — one big matmul
    xp_t = jnp.swapaxes(xp, 0, 1)  # (T, B, G)
    if rnn_type in ("LSTM", "GRU", "RNN") and resolved_backend() == "pallas":
        # Kernels take row lengths and synthesize step masks in-kernel
        # (ops/_mask_utils.span_mask): nothing mask-shaped reaches the
        # device.  The (B, T) mask is a contiguous prefix by
        # construction, so its row sum is the length.
        lengths = jnp.sum(mask.astype(jnp.float32), axis=1)
        interpret = jax.default_backend() != "tpu"
        if reverse:
            xp_t = jnp.flip(xp_t, 0)
        if rnn_type == "LSTM":
            from ..ops import lstm_pallas
            outs, h_n, c_n = lstm_pallas.lstm_layer(
                xp_t, lengths, params["w_hh"], params["b_hh"],
                interpret=interpret, precision=kernel_precision(),
                reverse=reverse)
        elif rnn_type == "GRU":
            from ..ops import gru_pallas
            outs, h_n = gru_pallas.gru_layer(
                xp_t, lengths, params["w_hh"], params["b_hh"],
                interpret=interpret, precision=kernel_precision(),
                reverse=reverse)
            c_n = jnp.zeros_like(h_n)
        else:
            from ..ops import elman_pallas
            outs, h_n = elman_pallas.rnn_layer(
                xp_t, lengths, params["w_hh"], params["b_hh"],
                interpret=interpret, precision=kernel_precision(),
                reverse=reverse)
            c_n = jnp.zeros_like(h_n)
        if reverse:
            outs = jnp.flip(outs, 0)
        return jnp.swapaxes(outs, 0, 1), (h_n, c_n)
    mask_t = jnp.swapaxes(mask, 0, 1)[..., None]  # (T, B, 1)
    h0 = jnp.zeros((b, hidden), x.dtype)
    c0 = jnp.zeros((b, hidden), x.dtype)

    def step(carry, inp):
        h, c = carry
        xpt, mt = inp
        if rnn_type == "LSTM":
            h2, c2 = lstm_step(params, xpt, h, c)
        elif rnn_type == "GRU":
            h2, c2 = gru_step(params, xpt, h), c
        else:
            h2, c2 = rnn_step(params, xpt, h), c
        h = jnp.where(mt, h2, h)
        c = jnp.where(mt, c2, c)
        return (h, c), h

    (h_n, c_n), outs = jax.lax.scan(step, (h0, c0), (xp_t, mask_t),
                                    reverse=reverse, unroll=SCAN_UNROLL)
    return jnp.swapaxes(outs, 0, 1), (h_n, c_n)


def lengths_to_mask(lengths: jax.Array, t: int, dtype=None) -> jax.Array:
    """(B,) lengths -> (B, T) validity mask; True/1.0 while t < length.

    With a floating ``dtype`` the mask is built arithmetically
    (``clip(length - position, 0, 1)``) instead of via a comparison:
    TPU pred tensors carry (4,1)-packed tiling whose convert-to-float
    cost ~0.6 ms/step at the publication shape (round-3 device trace:
    ``convert_element_type(pred[512,2,512,1])`` plus pred relayout
    copies), while the all-float build fuses to nothing.  Exact for
    lengths < 2**24.  Every in-model consumer either multiplies by the
    mask or passes it to ``jnp.where`` (which accepts any dtype), so
    the two forms are interchangeable.
    """
    if dtype is None or not jnp.issubdtype(dtype, jnp.floating):
        return jnp.arange(t, dtype=lengths.dtype)[None, :] < lengths[:, None]
    pos = jnp.arange(t, dtype=dtype)[None, :]
    return jnp.clip(lengths.astype(dtype)[:, None] - pos, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Fused bidirectional layer: both directions in ONE scan
# ---------------------------------------------------------------------------
# Two independent direction scans serialize on a TPU core; stacking them on
# a leading axis of the carry halves the sequential scan count.  The
# reverse direction consumes time-flipped inputs/masks, so scan step s
# processes position s forward and position T-1-s backward; its stacked
# outputs are flipped back afterwards.

def _stacked_gates(params: dict, xp_t: jax.Array, h: jax.Array) -> jax.Array:
    # xp_t (2, B, G); h (2, B, H); w_hh (2, H, G) -> (2, B, G)
    return (xp_t
            + jnp.einsum("dbh,dhg->dbg", h, params["w_hh"])
            + params["b_hh"][:, None, :])


def run_rnn_layer_bidir(rnn_type: str, p_fwd: dict, p_bwd: dict,
                        x: jax.Array, mask: jax.Array):
    """Both directions of one layer in a single masked scan.

    Returns (outs_fwd (B,T,H), outs_bwd (B,T,H),
             [(h,c)_fwd, (h,c)_bwd]) — same results as two
    run_rnn_layer calls (fwd, and bwd with reverse=True).
    """
    b, t, _ = x.shape
    hidden = p_fwd["w_hh"].shape[0]
    stacked = {k: jnp.stack([p_fwd[k], p_bwd[k]]) for k in p_fwd}
    mask_t = jnp.swapaxes(mask, 0, 1)[..., None]             # (T, B, 1)
    m = jnp.stack([mask_t, jnp.flip(mask_t, 0)], axis=1)     # (T, 2, B, 1)
    # The fully fused kernel folds the input projection into the time
    # loop (x streamed per direction by index map), so the (T,2,B,4H)
    # xp tensor — 2.1 GB at the publication shape, the single largest
    # HBM cost in the round-3 device trace — never exists.  The encoder
    # follows the measured rnn backend (utils/backend_select.py) like
    # the decoder; SEQ2SEQ_ENCODER_BACKEND=scan|pallas overrides.
    enc_backend = os.environ.get("SEQ2SEQ_ENCODER_BACKEND", "auto")
    if rnn_type in ("LSTM", "GRU", "RNN") and (enc_backend == "pallas" or (
            enc_backend == "auto" and resolved_backend() == "pallas")):
        x_t = jnp.swapaxes(x, 0, 1)                          # (T, B, F)
        # lengths only: per-direction step masks are synthesized
        # in-kernel, so the (T, 2, B, 1) stack/flip above is dead code
        # on this branch (XLA DCEs it)
        lengths = jnp.sum(mask.astype(jnp.float32), axis=1)
        interpret = jax.default_backend() != "tpu"
        if rnn_type == "LSTM":
            from ..ops import lstm_pallas
            outs, h_n, c_n = lstm_pallas.lstm_layer_bidir_fused(
                x_t, lengths, stacked["w_ih"], stacked["b_ih"],
                stacked["w_hh"], stacked["b_hh"],
                interpret=interpret, precision=kernel_precision())
        elif rnn_type == "GRU":
            from ..ops import gru_pallas
            outs, h_n = gru_pallas.gru_layer_bidir_fused(
                x_t, lengths, stacked["w_ih"], stacked["b_ih"],
                stacked["w_hh"], stacked["b_hh"],
                interpret=interpret, precision=kernel_precision())
            c_n = jnp.zeros_like(h_n)
        else:
            from ..ops import elman_pallas
            outs, h_n = elman_pallas.rnn_layer_bidir_fused(
                x_t, lengths, stacked["w_ih"], stacked["b_ih"],
                stacked["w_hh"], stacked["b_hh"],
                interpret=interpret, precision=kernel_precision())
            c_n = jnp.zeros_like(h_n)
        outs_f = jnp.swapaxes(outs[:, 0], 0, 1)
        outs_b = jnp.swapaxes(jnp.flip(outs[:, 1], 0), 0, 1)
        return outs_f, outs_b, [(h_n[0], c_n[0]), (h_n[1], c_n[1])]
    xp_f = jnp.swapaxes(input_proj(p_fwd, x), 0, 1)          # (T, B, G)
    xp_b = jnp.flip(jnp.swapaxes(input_proj(p_bwd, x), 0, 1), 0)
    xp = jnp.stack([xp_f, xp_b], axis=1)                     # (T, 2, B, G)
    h0 = jnp.zeros((2, b, hidden), x.dtype)
    c0 = jnp.zeros((2, b, hidden), x.dtype)

    def step(carry, inp):
        h, c = carry
        xpt, mt = inp
        if rnn_type == "LSTM":
            gates = _stacked_gates(stacked, xpt, h)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        elif rnn_type == "GRU":
            hp = (jnp.einsum("dbh,dhg->dbg", h, stacked["w_hh"])
                  + stacked["b_hh"][:, None, :])
            xr, xz, xn = jnp.split(xpt, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            h2 = (1.0 - z) * jnp.tanh(xn + r * hn) + z * h
            c2 = c
        else:
            h2 = jnp.tanh(_stacked_gates(stacked, xpt, h))
            c2 = c
        h = jnp.where(mt, h2, h)
        c = jnp.where(mt, c2, c)
        return (h, c), h

    (h_n, c_n), outs = jax.lax.scan(step, (h0, c0), (xp, m),
                                    unroll=SCAN_UNROLL)
    outs_f = jnp.swapaxes(outs[:, 0], 0, 1)
    outs_b = jnp.swapaxes(jnp.flip(outs[:, 1], 0), 0, 1)
    return outs_f, outs_b, [(h_n[0], c_n[0]), (h_n[1], c_n[1])]

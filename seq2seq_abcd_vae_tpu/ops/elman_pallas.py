"""Fused Pallas TPU kernels for full masked Elman-RNN layers (fwd + bwd).

``-R RNN`` (torch.nn.RNN, tanh nonlinearity) is the third first-class
cell choice in the reference (ABCD-VAE/modules/model.py:53,287-300).
Rounds 2-3 gave LSTM and GRU encoder layers whole-loop Pallas kernels
(ops/lstm_pallas.py, ops/gru_pallas.py); these complete the cell matrix
so every trainable recurrent cell takes the same kernel path:

- ``rnn_layer``: one direction over precomputed projected inputs
  ``xp = x @ W_ih + b_ih`` streamed per grid step, recurrent weights
  pinned in VMEM for the whole layer;
- ``rnn_layer_bidir_fused``: both directions in ONE kernel over the RAW
  (T, B, F) input — the input projection is computed per-step in VMEM so
  the projected tensor never exists in HBM, and the direction-1 time
  reversal is done by BlockSpec index maps.

torch.nn.RNN semantics (single tanh gate):

    h' = tanh(x W_ih + b_ih + h W_hh + b_hh)

Masking freezes finished rows (packed "shrinking batch" semantics,
reference model.py:175-177).  Both kernels are wired into
``jax.custom_vjp`` with hand-derived Pallas backward passes that
recompute the step nonlinearity from the saved h trajectory.  Backend
choice is measured at runtime (utils/backend_select.py).

A static ``leak`` (default 1.0 = plain Elman, compiled away) generalizes
both kernels to the ESN encoder layer (reference model.py:444,529-531:
h' = (1-leak) h + leak tanh(x W_ih + h W_hh), no biases — the caller
passes zero biases).  ESN reservoir weights are frozen OUTSIDE the
kernel (stop_gradient in models/esn.py), so the weight cotangents the
backward kernels compute are dropped by XLA there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _vjp_utils as _vjp
from ._mask_utils import span_mask as _span_mask
from .mxu import mxu_dot as _mxu_dot
from .mxu import mxu_dot_nt as _mxu_dot_nt
from .mxu import mxu_dot_tn as _mxu_dot_tn


# ---------------------------------------------------------------------------
# Unidirectional layer over projected inputs (mirror of gru_layer)
# ---------------------------------------------------------------------------


def _fwd_kernel(xp_ref, len_ref, w_ref, b_ref, out_ref, hn_ref, h_scr,
                *, precision=None, reverse=False, leak=1.0):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    h = h_scr[:]
    u = jnp.tanh(xp_ref[0] + _mxu_dot(h, w_ref[:, :], precision)
                 + b_ref[:, :])
    h2 = u if leak == 1.0 else (1.0 - leak) * h + leak * u
    m = _span_mask(t, nt, len_ref, reverse)
    h = jnp.where(m > 0, h2, h)
    h_scr[:] = h
    out_ref[0] = h

    @pl.when(t == nt - 1)
    def _():
        hn_ref[:, :] = h


def _bwd_kernel(xp_ref, len_ref, w_ref, b_ref, hprev_ref, dout_ref,
                dhn_ref, dxp_ref, dw_ref, db_ref, dh_scr,
                *, precision=None, reverse=False, leak=1.0):
    """Reverse-order grid: program s processes step t = T-1-s."""
    s = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        dh_scr[:] = dhn_ref[:, :]
        dw_ref[:, :] = jnp.zeros_like(dw_ref)
        db_ref[:, :] = jnp.zeros_like(db_ref)

    h_prev = hprev_ref[0]
    m = _span_mask(nt - 1 - s, nt, len_ref, reverse) > 0
    u = jnp.tanh(xp_ref[0] + _mxu_dot(h_prev, w_ref[:, :], precision)
                 + b_ref[:, :])

    dh = dh_scr[:] + dout_ref[0]
    dh2 = jnp.where(m, dh, 0.0)
    dpre = (dh2 if leak == 1.0 else leak * dh2) * (1.0 - u * u)
    dh_prev = (jnp.where(m, 0.0, dh)
               + _mxu_dot_nt(dpre, w_ref[:, :], precision))
    if leak != 1.0:
        dh_prev = dh_prev + (1.0 - leak) * dh2

    dxp_ref[0] = dpre
    dw_ref[:, :] += _mxu_dot_tn(h_prev, dpre, precision)
    db_ref[:, :] += jnp.sum(dpre, axis=0, keepdims=True)
    dh_scr[:] = dh_prev


def _fwd_call(xp, lengths_f, w_hh, b_hh, interpret, precision, reverse,
              leak=1.0):
    t, b, g = xp.shape
    hidden = w_hh.shape[0]
    b_row = b_hh.reshape(1, g)
    outs, h_n = pl.pallas_call(
        functools.partial(_fwd_kernel, precision=precision,
                          reverse=reverse, leak=leak),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, g), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, hidden), xp.dtype),
            jax.ShapeDtypeStruct((b, hidden), xp.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=interpret,
    )(xp, lengths_f, w_hh, b_row)
    return outs, h_n


def _bwd_call(xp, lengths_f, w_hh, b_hh, outs, douts, dh_n, interpret,
              precision, reverse, leak=1.0):
    t, b, g = xp.shape
    hidden = w_hh.shape[0]
    b_row = b_hh.reshape(1, g)
    zeros_state = jnp.zeros((1, b, hidden), xp.dtype)
    h_prev = jnp.concatenate([zeros_state, outs[:-1]], axis=0)

    rev = lambda i: (t - 1 - i, 0, 0)
    # douts=None: symbolic-zero outs cotangent (final encoder layer) —
    # one resident zero block instead of a (T,B,H) HBM stream
    if douts is None:
        douts = zeros_state
        dout_spec = pl.BlockSpec((1, b, hidden), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        dout_spec = pl.BlockSpec((1, b, hidden), rev,
                                 memory_space=pltpu.VMEM)
    dxp, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, precision=precision,
                          reverse=reverse, leak=leak),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, g), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hidden), rev, memory_space=pltpu.VMEM),
            dout_spec,
            pl.BlockSpec((b, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, g), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, g), xp.dtype),
            jax.ShapeDtypeStruct((hidden, g), xp.dtype),
            jax.ShapeDtypeStruct((1, g), xp.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=interpret,
    )(xp, lengths_f, w_hh, b_row, h_prev, douts, dh_n)
    return dxp, dw, db.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _rnn_layer_cvjp(xp, lengths_f, w_hh, b_hh, interpret, precision, reverse,
                    leak):
    outs, h_n = _fwd_call(xp, lengths_f, w_hh, b_hh, interpret, precision,
                          reverse, leak)
    return outs, h_n


def _rnn_layer_fwd(xp, lengths_f, w_hh, b_hh, interpret, precision, reverse,
                   leak):
    xp, lengths_f, w_hh, b_hh = _vjp.primals(xp, lengths_f, w_hh, b_hh)
    outs, h_n = _fwd_call(xp, lengths_f, w_hh, b_hh, interpret, precision,
                          reverse, leak)
    return (outs, h_n), (xp, lengths_f, w_hh, b_hh, outs)


def _rnn_layer_bwd(interpret, precision, reverse, leak, residuals, grads):
    xp, lengths_f, w_hh, b_hh, outs = residuals
    douts, dh_n = grads
    b, hidden = outs.shape[1], outs.shape[2]
    dxp, dw, db = _bwd_call(
        xp, lengths_f, w_hh, b_hh, outs,
        None if _vjp.is_sym_zero(douts) else douts,
        _vjp.dense_small(dh_n, (b, hidden), xp.dtype),
        interpret, precision, reverse, leak)
    return dxp, jnp.zeros_like(lengths_f), dw, db


_rnn_layer_cvjp.defvjp(_rnn_layer_fwd, _rnn_layer_bwd,
                       symbolic_zeros=True)


def rnn_layer(xp, lengths, w_hh, b_hh, interpret=False, precision=None,
              reverse=False, leak=1.0):
    """Masked Elman-RNN layer over time-major projected inputs.

    Args:
      xp: (T, B, H) precomputed x @ W_ih + b_ih.
      lengths: (B,) valid step counts; the step mask is synthesized
        in-kernel (ops/_mask_utils.span_mask); reverse=True selects the
        time-flipped interval [T-len, T).
      w_hh: (H, H) recurrent weights.
      b_hh: (H,) recurrent bias.
      leak: < 1.0 selects the ESN cell (model.py:444,529-531):
        h' = (1-leak) h + leak tanh(xp + h W_hh); pass b_hh = 0 and
        xp = x @ W_ih (ESN has no biases).

    Returns (outs (T, B, H), h_n (B, H)) — identical to the scan path in
    models/rnn.run_rnn_layer (forward direction), differentiable through
    jax.grad (custom VJP, backward also Pallas).
    """
    lengths_f = jnp.asarray(lengths, jnp.float32).reshape(-1, 1)
    return _rnn_layer_cvjp(xp, lengths_f, w_hh,
                           b_hh, interpret, precision, reverse, leak)


# ---------------------------------------------------------------------------
# Fully fused bidirectional layer over RAW inputs (mirror of
# gru_layer_bidir_fused): input projection inside the kernel, time
# reversal via index maps, dW_ih/db_ih/dx computed in-kernel.
# ---------------------------------------------------------------------------


def _fwdf_kernel(xf_ref, xb_ref, len_ref, wih_ref, bih_ref, whh_ref,
                 bhh_ref, out_ref, hn_ref, h_scr, *, precision=None,
                 leak=1.0):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    for d in range(2):
        x_t = xf_ref[0] if d == 0 else xb_ref[0]
        h = h_scr[d]
        u = jnp.tanh(_mxu_dot(x_t, wih_ref[d], precision) + bih_ref[d]
                     + _mxu_dot(h, whh_ref[d], precision) + bhh_ref[d])
        h2 = u if leak == 1.0 else (1.0 - leak) * h + leak * u
        m = _span_mask(t, nt, len_ref, reverse=d == 1)
        h = jnp.where(m > 0, h2, h)
        h_scr[d] = h
        out_ref[0, d] = h

        @pl.when(t == nt - 1)
        def _():
            hn_ref[d] = h


def _bwdf_kernel(xr_ref, xf_ref, len_ref, wih_ref, bih_ref, whh_ref,
                 bhh_ref, hprev_ref, dout_ref, dhn_ref,
                 dx0_ref, dx1_ref, dwih_ref, dbih_ref, dwhh_ref,
                 dbhh_ref, dh_scr, *, precision=None, leak=1.0):
    """Grid step s handles recurrence position tau = T-1-s of BOTH
    directions (each in its own time axis); same streaming scheme as
    gru_pallas._bwdf_kernel."""
    s = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        dh_scr[:] = dhn_ref[:, :, :]
        dwih_ref[:, :, :] = jnp.zeros_like(dwih_ref)
        dbih_ref[:, :, :] = jnp.zeros_like(dbih_ref)
        dwhh_ref[:, :, :] = jnp.zeros_like(dwhh_ref)
        dbhh_ref[:, :, :] = jnp.zeros_like(dbhh_ref)

    first_step = s == nt - 1  # tau == 0
    for d in range(2):
        x_t = xr_ref[0] if d == 0 else xf_ref[0]
        zero = jnp.zeros_like(hprev_ref[0, d])
        h_prev = jnp.where(first_step, zero, hprev_ref[0, d])
        m = _span_mask(nt - 1 - s, nt, len_ref, reverse=d == 1) > 0
        u = jnp.tanh(
            _mxu_dot(x_t, wih_ref[d], precision) + bih_ref[d]
            + _mxu_dot(h_prev, whh_ref[d], precision) + bhh_ref[d])

        dh = dh_scr[d] + dout_ref[0, d]
        dh2 = jnp.where(m, dh, 0.0)
        dpre = (dh2 if leak == 1.0 else leak * dh2) * (1.0 - u * u)
        dh_prev = (jnp.where(m, 0.0, dh)
                   + _mxu_dot_nt(dpre, whh_ref[d], precision))
        if leak != 1.0:
            dh_prev = dh_prev + (1.0 - leak) * dh2
        dx = _mxu_dot_nt(dpre, wih_ref[d], precision)
        if d == 0:
            dx0_ref[0] = dx
        else:
            dx1_ref[0] = dx
        dwih_ref[d] += _mxu_dot_tn(x_t, dpre, precision)
        dbih_ref[d] += jnp.sum(dpre, axis=0, keepdims=True)
        dwhh_ref[d] += _mxu_dot_tn(h_prev, dpre, precision)
        dbhh_ref[d] += jnp.sum(dpre, axis=0, keepdims=True)
        dh_scr[d] = dh_prev


def _fwdf_call(x, lengths_f, w_ih, b_ih, w_hh, b_hh, interpret, precision,
               leak=1.0):
    t, b, f_dim = x.shape
    hidden = w_hh.shape[1]
    g = w_hh.shape[2]
    bih_row = b_ih.reshape(2, 1, g)
    bhh_row = b_hh.reshape(2, 1, g)
    res = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                   memory_space=pltpu.VMEM)
    fwd = lambda shp: pl.BlockSpec(shp, lambda i: (i,) + (0,) *
                                   (len(shp) - 1),
                                   memory_space=pltpu.VMEM)
    bwd = lambda shp: pl.BlockSpec(shp, lambda i: (t - 1 - i,) + (0,) *
                                   (len(shp) - 1),
                                   memory_space=pltpu.VMEM)
    outs, h_n = pl.pallas_call(
        functools.partial(_fwdf_kernel, precision=precision, leak=leak),
        grid=(t,),
        in_specs=[fwd((1, b, f_dim)), bwd((1, b, f_dim)),
                  res((b, 1)),
                  res((2, f_dim, g)), res((2, 1, g)),
                  res((2, hidden, g)), res((2, 1, g))],
        out_specs=[fwd((1, 2, b, hidden)), res((2, b, hidden))],
        out_shape=[jax.ShapeDtypeStruct((t, 2, b, hidden), x.dtype),
                   jax.ShapeDtypeStruct((2, b, hidden), x.dtype)],
        scratch_shapes=[pltpu.VMEM((2, b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, lengths_f, w_ih, bih_row, w_hh, bhh_row)
    return outs, h_n


def _bwdf_call(x, lengths_f, w_ih, b_ih, w_hh, b_hh, outs, douts, dh_n,
               interpret, precision, leak=1.0):
    t, b, f_dim = x.shape
    hidden = w_hh.shape[1]
    g = w_hh.shape[2]
    bih_row = b_ih.reshape(2, 1, g)
    bhh_row = b_hh.reshape(2, 1, g)
    res = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                   memory_space=pltpu.VMEM)
    fwd = lambda shp: pl.BlockSpec(shp, lambda i: (i,) + (0,) *
                                   (len(shp) - 1),
                                   memory_space=pltpu.VMEM)
    rev = lambda shp: pl.BlockSpec(shp, lambda i: (t - 1 - i,) + (0,) *
                                   (len(shp) - 1),
                                   memory_space=pltpu.VMEM)
    # block tau-1, clamped at 0; the kernel substitutes zeros at tau==0
    shift = lambda shp: pl.BlockSpec(
        shp, lambda i: (jnp.maximum(t - 2 - i, 0),) + (0,) *
        (len(shp) - 1),
        memory_space=pltpu.VMEM)
    # douts=None: symbolic-zero outs cotangent (final encoder layer)
    if douts is None:
        douts = jnp.zeros((1, 2, b, hidden), x.dtype)
        dout_spec = pl.BlockSpec((1, 2, b, hidden),
                                 lambda i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        dout_spec = rev((1, 2, b, hidden))
    dx0, dx1, dwih, dbih, dwhh, dbhh = pl.pallas_call(
        functools.partial(_bwdf_kernel, precision=precision, leak=leak),
        grid=(t,),
        in_specs=[rev((1, b, f_dim)), fwd((1, b, f_dim)),
                  res((b, 1)),
                  res((2, f_dim, g)), res((2, 1, g)),
                  res((2, hidden, g)), res((2, 1, g)),
                  shift((1, 2, b, hidden)),
                  dout_spec,
                  res((2, b, hidden))],
        out_specs=[rev((1, b, f_dim)), fwd((1, b, f_dim)),
                   res((2, f_dim, g)), res((2, 1, g)),
                   res((2, hidden, g)), res((2, 1, g))],
        out_shape=[jax.ShapeDtypeStruct((t, b, f_dim), x.dtype),
                   jax.ShapeDtypeStruct((t, b, f_dim), x.dtype),
                   jax.ShapeDtypeStruct((2, f_dim, g), x.dtype),
                   jax.ShapeDtypeStruct((2, 1, g), x.dtype),
                   jax.ShapeDtypeStruct((2, hidden, g), x.dtype),
                   jax.ShapeDtypeStruct((2, 1, g), x.dtype)],
        scratch_shapes=[pltpu.VMEM((2, b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, lengths_f, w_ih, bih_row, w_hh, bhh_row, outs, douts, dh_n)
    return (dx0 + dx1, dwih, dbih.reshape(2, -1), dwhh,
            dbhh.reshape(2, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _rnn_bidir_fused_cvjp(x, lengths_f, w_ih, b_ih, w_hh, b_hh, interpret,
                          precision, leak):
    outs, h_n = _fwdf_call(x, lengths_f, w_ih, b_ih, w_hh, b_hh, interpret,
                           precision, leak)
    return outs, h_n


def _rnn_bidir_fused_fwd(x, lengths_f, w_ih, b_ih, w_hh, b_hh, interpret,
                         precision, leak):
    x, lengths_f, w_ih, b_ih, w_hh, b_hh = _vjp.primals(
        x, lengths_f, w_ih, b_ih, w_hh, b_hh)
    outs, h_n = _fwdf_call(x, lengths_f, w_ih, b_ih, w_hh, b_hh, interpret,
                           precision, leak)
    return (outs, h_n), (x, lengths_f, w_ih, b_ih, w_hh, b_hh, outs)


def _rnn_bidir_fused_bwd(interpret, precision, leak, residuals, grads):
    x, lengths_f, w_ih, b_ih, w_hh, b_hh, outs = residuals
    douts, dh_n = grads
    b, hidden = outs.shape[2], outs.shape[3]
    dx, dwih, dbih, dwhh, dbhh = _bwdf_call(
        x, lengths_f, w_ih, b_ih, w_hh, b_hh, outs,
        None if _vjp.is_sym_zero(douts) else douts,
        _vjp.dense_small(dh_n, (2, b, hidden), x.dtype),
        interpret, precision, leak)
    return dx, jnp.zeros_like(lengths_f), dwih, dbih, dwhh, dbhh


_rnn_bidir_fused_cvjp.defvjp(_rnn_bidir_fused_fwd, _rnn_bidir_fused_bwd,
                             symbolic_zeros=True)


def rnn_layer_bidir_fused(x, lengths, w_ih, b_ih, w_hh, b_hh,
                          interpret=False, precision=None, leak=1.0):
    """Fully fused bidirectional masked Elman-RNN layer over RAW inputs.

    Args:
      x: (T, B, F) time-major UNprojected inputs (original time order;
        the kernel's index maps read direction 1 reversed).
      lengths: (B,) valid step counts; per-direction step masks are
        synthesized in-kernel (direction 1 = time-flipped; same layout
        as lstm_layer_bidir_fused).
      w_ih: (2, F, H); b_ih: (2, H); w_hh: (2, H, H); b_hh: (2, H).
      leak: < 1.0 selects the ESN cell (model.py:444,529-531); pass zero
        biases (ESN has none).

    Returns (outs (T, 2, B, H) — direction 1 in ITS OWN (flipped) time
    order, h_n (2, B, H)); numerically matches
    models/rnn.run_rnn_layer_bidir's scan.  Gradients flow to x and all
    four weights (custom VJP, both passes Pallas).
    """
    lengths_f = jnp.asarray(lengths, jnp.float32).reshape(-1, 1)
    return _rnn_bidir_fused_cvjp(x, lengths_f, w_ih, b_ih,
                                 w_hh, b_hh, interpret, precision, leak)

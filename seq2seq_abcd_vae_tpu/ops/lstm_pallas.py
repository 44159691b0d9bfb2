"""Fused Pallas TPU kernel for a full masked LSTM layer (fwd + bwd).

The XLA ``lax.scan`` path (models/rnn.py) re-fetches the recurrent weights
from HBM every step and materializes each step's gate tensor; this kernel
runs the *whole time loop* as one Pallas program:

- grid = (T,): TPU grid steps execute sequentially, so VMEM scratch
  (h, c carry) persists across steps while Pallas double-buffers the
  streamed inputs/outputs (xp_t, mask_t -> out_t) automatically;
- the recurrent weights (H, 4H) and biases live in VMEM for the entire
  layer — one HBM read total instead of T;
- masking freezes finished rows exactly like the scan path (packed
  "shrinking batch" semantics, reference model.py:175-177).

The backward pass is a second Pallas kernel running the standard LSTM
adjoint in reverse grid order, recomputing the gates from the saved
(h, c) trajectories (cheaper than saving (T, B, 4H) activations), and
accumulating dW_hh / db_hh in VMEM scratch.  ``lstm_layer`` wires both
into a ``jax.custom_vjp`` so ``jax.grad`` through the training step works
unchanged.

The kernel covers the hot default configuration (unidirectional grid over
time; the encoder calls it once per direction).  Enable with
SEQ2SEQ_RNN_BACKEND=pallas; parity with the scan path is tested in
interpret mode (tests/test_lstm_pallas.py) and verified on hardware.

NOTE on this container's tunneled TPU: the per-``pallas_call`` dispatch
penalty is tunnel-dependent and has varied by orders of magnitude between
sessions (round 1 measured ~0.5-1 s/call, making scan the winner; round 2
measured 0.07-3 ms, making this kernel the winner).  The backend is
therefore *measured at startup* by utils/backend_select.py rather than
assumed — check ``backend_report()`` for the decision actually in effect.
On directly attached TPUs the kernel's VMEM-pinned weights remove T HBM
weight reads per layer.
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


def _fwd_kernel(xp_ref, len_ref, w_ref, b_ref, out_ref, cs_ref, hn_ref,
                cn_ref, h_scr, c_scr, *, precision=None, reverse=False):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]
    gates = (xp_ref[0] + _mxu_dot(h, w_ref[:, :], precision)
             + b_ref[:, :])
    hidden = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)
    m = _span_mask(t, nt, len_ref, reverse)
    h = jnp.where(m > 0, h2, h)
    c = jnp.where(m > 0, c2, c)
    h_scr[:] = h
    c_scr[:] = c
    out_ref[0] = h
    cs_ref[0] = c

    @pl.when(t == nt - 1)
    def _():
        hn_ref[:, :] = h
        cn_ref[:, :] = c


def _bwd_kernel(xp_ref, len_ref, w_ref, b_ref, hprev_ref, cprev_ref,
                c_ref, dout_ref, dhn_ref, dcn_ref,
                dxp_ref, dw_ref, db_ref,
                dh_scr, dc_scr, *, precision=None, reverse=False):
    """Reverse-order grid: program s processes step t = T-1-s."""
    s = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        dh_scr[:] = dhn_ref[:, :]
        dc_scr[:] = dcn_ref[:, :]
        dw_ref[:, :] = jnp.zeros_like(dw_ref)
        db_ref[:, :] = jnp.zeros_like(db_ref)

    h_prev = hprev_ref[0]
    c_prev = cprev_ref[0]
    c_new = c_ref[0]
    m = _span_mask(nt - 1 - s, nt, len_ref, reverse)

    # Recompute the gates of this step.
    gates = (xp_ref[0] + _mxu_dot(h_prev, w_ref[:, :], precision)
             + b_ref[:, :])
    hidden = h_prev.shape[-1]
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    # c2/h2 as computed pre-mask; where mask=0 the step was the identity.
    c2 = jnp.where(m > 0, c_new, f * c_prev + i * g)  # c_new == c2 masked in
    tanh_c2 = jnp.tanh(c2)

    dh = dh_scr[:] + dout_ref[0]  # upstream grad of this step's output
    dc = dc_scr[:]

    dh_step = jnp.where(m > 0, dh, 0.0)
    dc_step = jnp.where(m > 0, dc, 0.0)

    do = dh_step * tanh_c2
    dc2 = dc_step + dh_step * o * (1.0 - tanh_c2 * tanh_c2)
    df = dc2 * c_prev
    di = dc2 * g
    dg = dc2 * i
    dz_i = di * i * (1.0 - i)
    dz_f = df * f * (1.0 - f)
    dz_g = dg * (1.0 - g * g)
    dz_o = do * o * (1.0 - o)
    dz = jnp.concatenate([dz_i, dz_f, dz_g, dz_o], axis=-1)

    # grads through the identity branch (mask=0): dh/dc pass straight.
    dh_prev = (jnp.where(m > 0, 0.0, dh)
               + _mxu_dot_nt(dz, w_ref[:, :], precision))
    dc_prev = jnp.where(m > 0, dc2 * f, dc)

    dxp_ref[0] = dz
    dw_ref[:, :] += _mxu_dot_tn(h_prev, dz, precision)
    db_ref[:, :] += jnp.sum(dz, axis=0, keepdims=True)
    dh_scr[:] = dh_prev
    dc_scr[:] = dc_prev


def _fwd_call(xp, lengths_f, w_hh, b_hh, interpret, precision, reverse):
    t, b, g = xp.shape
    hidden = w_hh.shape[0]
    b_row = b_hh.reshape(1, g)
    outs, cs, h_n, c_n = pl.pallas_call(
        functools.partial(_fwd_kernel, precision=precision,
                          reverse=reverse),
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
            pl.BlockSpec((1, b, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, hidden), xp.dtype),
            jax.ShapeDtypeStruct((t, b, hidden), xp.dtype),
            jax.ShapeDtypeStruct((b, hidden), xp.dtype),
            jax.ShapeDtypeStruct((b, hidden), xp.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((b, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xp, lengths_f, w_hh, b_row)
    return outs, cs, h_n, c_n


def _bwd_call(xp, lengths_f, w_hh, b_hh, outs, cs, douts, dh_n, dc_n,
              interpret, precision, reverse):
    t, b, g = xp.shape
    hidden = w_hh.shape[0]
    b_row = b_hh.reshape(1, g)
    zeros_state = jnp.zeros((1, b, hidden), xp.dtype)
    # h_{t-1}, c_{t-1} streams: shift the saved trajectories by one.
    h_prev = jnp.concatenate([zeros_state, outs[:-1]], axis=0)
    c_prev = jnp.concatenate([zeros_state, cs[:-1]], axis=0)

    rev = lambda i: (t - 1 - i, 0, 0)
    # douts=None: the outs cotangent is a symbolic zero (final encoder
    # layer) — substitute one resident zero block (ops/_vjp_utils.py)
    if douts is None:
        douts = zeros_state
        dout_spec = pl.BlockSpec((1, b, hidden), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        dout_spec = pl.BlockSpec((1, b, hidden), rev,
                                 memory_space=pltpu.VMEM)
    dxp, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, precision=precision,
                          reverse=reverse),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, g), rev, memory_space=pltpu.VMEM),       # xp
            pl.BlockSpec((b, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                       # len
            pl.BlockSpec((hidden, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                       # w
            pl.BlockSpec((1, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                       # b
            pl.BlockSpec((1, b, hidden), rev, memory_space=pltpu.VMEM),  # h_prev
            pl.BlockSpec((1, b, hidden), rev, memory_space=pltpu.VMEM),  # c_prev
            pl.BlockSpec((1, b, hidden), rev, memory_space=pltpu.VMEM),  # c
            dout_spec,                                                   # dout
            pl.BlockSpec((b, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                       # dh_n
            pl.BlockSpec((b, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                       # dc_n
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
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((b, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xp, lengths_f, w_hh, b_row, h_prev, c_prev, cs, douts, dh_n, dc_n)
    return dxp, dw, db.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _lstm_layer_cvjp(xp, lengths_f, w_hh, b_hh, interpret, precision,
                     reverse):
    outs, cs, h_n, c_n = _fwd_call(xp, lengths_f, w_hh, b_hh, interpret,
                                   precision, reverse)
    return outs, h_n, c_n


def _lstm_layer_fwd(xp, lengths_f, w_hh, b_hh, interpret, precision,
                    reverse):
    xp, lengths_f, w_hh, b_hh = _vjp.primals(xp, lengths_f, w_hh, b_hh)
    outs, cs, h_n, c_n = _fwd_call(xp, lengths_f, w_hh, b_hh, interpret,
                                   precision, reverse)
    return (outs, h_n, c_n), (xp, lengths_f, w_hh, b_hh, outs, cs)


def _lstm_layer_bwd(interpret, precision, reverse, residuals, grads):
    xp, lengths_f, w_hh, b_hh, outs, cs = residuals
    douts, dh_n, dc_n = grads
    b, hidden = outs.shape[1], outs.shape[2]
    dxp, dw, db = _bwd_call(
        xp, lengths_f, w_hh, b_hh, outs, cs,
        None if _vjp.is_sym_zero(douts) else douts,
        _vjp.dense_small(dh_n, (b, hidden), xp.dtype),
        _vjp.dense_small(dc_n, (b, hidden), xp.dtype),
        interpret, precision, reverse)
    return dxp, jnp.zeros_like(lengths_f), dw, db


_lstm_layer_cvjp.defvjp(_lstm_layer_fwd, _lstm_layer_bwd,
                        symbolic_zeros=True)


def lstm_layer(xp, lengths, w_hh, b_hh, interpret=False, precision=None,
               reverse=False):
    """Masked LSTM layer over time-major projected inputs.

    Args:
      xp: (T, B, 4H) precomputed x @ W_ih + b_ih (time-flipped by the
        caller for the reverse direction).
      lengths: (B,) valid step counts; the step mask is synthesized
        in-kernel from a resident (B, 1) float block
        (ops/_mask_utils.span_mask) — reverse=True selects the
        time-flipped interval [T-len, T).
      w_hh: (H, 4H) recurrent weights (gate order i,f,g,o).
      b_hh: (4H,) recurrent bias.

    Returns (outs (T, B, H), h_n (B, H), c_n (B, H)) — identical to the
    scan path in models/rnn.run_rnn_layer, and differentiable through
    jax.grad (custom VJP, backward also Pallas).
    """
    lengths_f = jnp.asarray(lengths, jnp.float32).reshape(-1, 1)
    return _lstm_layer_cvjp(xp, lengths_f, w_hh, b_hh,
                            interpret, precision, reverse)


# ---------------------------------------------------------------------------
# Stacked-direction (bidirectional) layer: both directions' time loops in
# ONE kernel — two independent pallas calls would double the sequential
# step count; here each grid step advances forward position s and reverse
# position T-1-s together (models/rnn.run_rnn_layer_bidir semantics; the
# caller passes direction-1 streams already time-flipped).
# ---------------------------------------------------------------------------


def _fwd2_kernel(xp_ref, len_ref, w_ref, b_ref, out_ref, cs_ref, hn_ref,
                 cn_ref, h_scr, c_scr, *, precision=None):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    for d in range(2):
        h = h_scr[d]
        c = c_scr[d]
        gates = (xp_ref[0, d] + _mxu_dot(h, w_ref[d], precision)
                 + b_ref[d])
        hidden = h.shape[-1]
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c2 = f * c + i * g
        h2 = o * jnp.tanh(c2)
        m = _span_mask(t, nt, len_ref, reverse=d == 1)
        h = jnp.where(m > 0, h2, h)
        c = jnp.where(m > 0, c2, c)
        h_scr[d] = h
        c_scr[d] = c
        out_ref[0, d] = h
        cs_ref[0, d] = c

        @pl.when(t == nt - 1)
        def _():
            hn_ref[d] = h
            cn_ref[d] = c


def _bwd2_kernel(xp_ref, len_ref, w_ref, b_ref, hprev_ref, cprev_ref,
                 c_ref, dout_ref, dhn_ref, dcn_ref,
                 dxp_ref, dw_ref, db_ref, dh_scr, dc_scr, *,
                 precision=None):
    s = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        dh_scr[:] = dhn_ref[:, :, :]
        dc_scr[:] = dcn_ref[:, :, :]
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)
        db_ref[:, :, :] = jnp.zeros_like(db_ref)

    for d in range(2):
        h_prev = hprev_ref[0, d]
        c_prev = cprev_ref[0, d]
        c_new = c_ref[0, d]
        m = _span_mask(nt - 1 - s, nt, len_ref, reverse=d == 1)
        gates = (xp_ref[0, d] + _mxu_dot(h_prev, w_ref[d], precision)
                 + b_ref[d])
        hidden = h_prev.shape[-1]
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c2 = jnp.where(m > 0, c_new, f * c_prev + i * g)
        tanh_c2 = jnp.tanh(c2)

        dh = dh_scr[d] + dout_ref[0, d]
        dc = dc_scr[d]
        dh_step = jnp.where(m > 0, dh, 0.0)
        dc_step = jnp.where(m > 0, dc, 0.0)
        do = dh_step * tanh_c2
        dc2 = dc_step + dh_step * o * (1.0 - tanh_c2 * tanh_c2)
        df = dc2 * c_prev
        di = dc2 * g
        dg = dc2 * i
        dz = jnp.concatenate(
            [di * i * (1.0 - i), df * f * (1.0 - f), dg * (1.0 - g * g),
             do * o * (1.0 - o)], axis=-1)
        dh_prev = (jnp.where(m > 0, 0.0, dh)
                   + _mxu_dot_nt(dz, w_ref[d], precision))
        dc_prev = jnp.where(m > 0, dc2 * f, dc)
        dxp_ref[0, d] = dz
        dw_ref[d] += _mxu_dot_tn(h_prev, dz, precision)
        db_ref[d] += jnp.sum(dz, axis=0, keepdims=True)
        dh_scr[d] = dh_prev
        dc_scr[d] = dc_prev


def _fwd2_call(xp, lengths_f, w_hh, b_hh, interpret, precision):
    t, two, b, g = xp.shape
    hidden = w_hh.shape[1]
    b_row = b_hh.reshape(2, 1, g)
    res2 = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.VMEM)
    stream = lambda shp: pl.BlockSpec(shp, lambda i: (i,) + (0,) *
                                      (len(shp) - 1),
                                      memory_space=pltpu.VMEM)
    outs, cs, h_n, c_n = pl.pallas_call(
        functools.partial(_fwd2_kernel, precision=precision),
        grid=(t,),
        in_specs=[stream((1, 2, b, g)), res2((b, 1)),
                  res2((2, hidden, g)), res2((2, 1, g))],
        out_specs=[stream((1, 2, b, hidden)), stream((1, 2, b, hidden)),
                   res2((2, b, hidden)), res2((2, b, hidden))],
        out_shape=[jax.ShapeDtypeStruct((t, 2, b, hidden), xp.dtype),
                   jax.ShapeDtypeStruct((t, 2, b, hidden), xp.dtype),
                   jax.ShapeDtypeStruct((2, b, hidden), xp.dtype),
                   jax.ShapeDtypeStruct((2, b, hidden), xp.dtype)],
        scratch_shapes=[pltpu.VMEM((2, b, hidden), jnp.float32),
                        pltpu.VMEM((2, b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, lengths_f, w_hh, b_row)
    return outs, cs, h_n, c_n


def _bwd2_call(xp, lengths_f, w_hh, b_hh, outs, cs, douts, dh_n, dc_n,
               interpret, precision):
    t, two, b, g = xp.shape
    hidden = w_hh.shape[1]
    b_row = b_hh.reshape(2, 1, g)
    zeros_state = jnp.zeros((1, 2, b, hidden), xp.dtype)
    h_prev = jnp.concatenate([zeros_state, outs[:-1]], axis=0)
    c_prev = jnp.concatenate([zeros_state, cs[:-1]], axis=0)
    res2 = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.VMEM)
    rev = lambda shp: pl.BlockSpec(shp, lambda i: (t - 1 - i,) + (0,) *
                                   (len(shp) - 1),
                                   memory_space=pltpu.VMEM)
    dxp, dw, db = pl.pallas_call(
        functools.partial(_bwd2_kernel, precision=precision),
        grid=(t,),
        in_specs=[rev((1, 2, b, g)), res2((b, 1)),
                  res2((2, hidden, g)), res2((2, 1, g)),
                  rev((1, 2, b, hidden)), rev((1, 2, b, hidden)),
                  rev((1, 2, b, hidden)), rev((1, 2, b, hidden)),
                  res2((2, b, hidden)), res2((2, b, hidden))],
        out_specs=[rev((1, 2, b, g)), res2((2, hidden, g)),
                   res2((2, 1, g))],
        out_shape=[jax.ShapeDtypeStruct((t, 2, b, g), xp.dtype),
                   jax.ShapeDtypeStruct((2, hidden, g), xp.dtype),
                   jax.ShapeDtypeStruct((2, 1, g), xp.dtype)],
        scratch_shapes=[pltpu.VMEM((2, b, hidden), jnp.float32),
                        pltpu.VMEM((2, b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, lengths_f, w_hh, b_row, h_prev, c_prev, cs, douts, dh_n, dc_n)
    return dxp, dw, db.reshape(2, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _lstm_bidir_cvjp(xp, lengths_f, w_hh, b_hh, interpret, precision):
    outs, cs, h_n, c_n = _fwd2_call(xp, lengths_f, w_hh, b_hh, interpret,
                                    precision)
    return outs, h_n, c_n


def _lstm_bidir_fwd(xp, lengths_f, w_hh, b_hh, interpret, precision):
    outs, cs, h_n, c_n = _fwd2_call(xp, lengths_f, w_hh, b_hh, interpret,
                                    precision)
    return (outs, h_n, c_n), (xp, lengths_f, w_hh, b_hh, outs, cs)


def _lstm_bidir_bwd(interpret, precision, residuals, grads):
    xp, lengths_f, w_hh, b_hh, outs, cs = residuals
    douts, dh_n, dc_n = grads
    dxp, dw, db = _bwd2_call(xp, lengths_f, w_hh, b_hh, outs, cs, douts,
                             dh_n, dc_n, interpret, precision)
    return dxp, jnp.zeros_like(lengths_f), dw, db


_lstm_bidir_cvjp.defvjp(_lstm_bidir_fwd, _lstm_bidir_bwd)


def lstm_layer_bidir(xp, lengths, w_hh, b_hh, interpret=False,
                     precision=None):
    """Both directions of a masked LSTM layer in one kernel.

    Args:
      xp: (T, 2, B, 4H) projected inputs; direction 1 already
        time-flipped (run_rnn_layer_bidir layout).
      lengths: (B,) valid step counts; per-direction step masks are
        synthesized in-kernel (direction 1 uses the time-flipped
        interval [T-len, T)).
      w_hh: (2, H, 4H); b_hh: (2, 4H).

    Returns (outs (T, 2, B, H) masked per-step carries, h_n (2, B, H),
    c_n (2, B, H)) — identical to the fused scan in
    models/rnn.run_rnn_layer_bidir.
    """
    lengths_f = jnp.asarray(lengths, jnp.float32).reshape(-1, 1)
    return _lstm_bidir_cvjp(xp, lengths_f, w_hh, b_hh,
                            interpret, precision)


# ---------------------------------------------------------------------------
# Fully fused bidirectional layer: input projection INSIDE the kernel.
#
# The xp-based kernels above still require the caller to materialize
# xp = x @ W_ih (+flip for direction 1) — at the publication shape that
# is a (T, 2, B, 4H) f32 tensor (2.1 GB) written and re-read by both
# passes, plus reverse/pad/copy relayouts; the round-3 device trace
# shows that machinery costing ~25-30 ms/step of pure HBM traffic, more
# than the recurrence itself.  Here the kernel streams the raw
# (T, B, F) input twice (once per direction, the time reversal done for
# free by the BlockSpec index map) and computes x_t @ W_ih per step in
# VMEM, so xp never exists in HBM.  The backward kernel likewise
# recomputes the projection, accumulates dW_ih/db_ih in VMEM, streams
# the per-direction dx contributions back in ORIGINAL time order (the
# index maps undo the direction flip), and reads the h/c trajectories
# at block t-1 via a clamped index map instead of requiring the caller
# to slice+pad 0.5 GB shifted copies.
# ---------------------------------------------------------------------------


def _fwdf_kernel(xf_ref, xb_ref, len_ref, wih_ref, bih_ref, whh_ref,
                 bhh_ref, out_ref, cs_ref, hn_ref, cn_ref, h_scr, c_scr,
                 *, precision=None):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    for d in range(2):
        x_t = xf_ref[0] if d == 0 else xb_ref[0]
        h = h_scr[d]
        c = c_scr[d]
        gates = (_mxu_dot(x_t, wih_ref[d], precision)
                 + bih_ref[d]
                 + _mxu_dot(h, whh_ref[d], precision)
                 + bhh_ref[d])
        hidden = h.shape[-1]
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c2 = f * c + i * g
        h2 = o * jnp.tanh(c2)
        m = _span_mask(t, nt, len_ref, reverse=d == 1)
        h = jnp.where(m > 0, h2, h)
        c = jnp.where(m > 0, c2, c)
        h_scr[d] = h
        c_scr[d] = c
        out_ref[0, d] = h
        cs_ref[0, d] = c

        @pl.when(t == nt - 1)
        def _():
            hn_ref[d] = h
            cn_ref[d] = c


def _bwdf_kernel(xr_ref, xf_ref, len_ref, wih_ref, bih_ref, whh_ref,
                 bhh_ref, hprev_ref, cprev_ref, c_ref, dout_ref,
                 dhn_ref, dcn_ref,
                 dx0_ref, dx1_ref, dwih_ref, dbih_ref, dwhh_ref,
                 dbhh_ref, dh_scr, dc_scr, *, precision=None):
    """Grid step s handles recurrence position tau = T-1-s of BOTH
    directions (each in its own time axis).  xr streams x at the
    direction-0 position (original index tau), xf at the direction-1
    position (original index s).  hprev/cprev stream the saved
    trajectories at block tau-1 (clamped); at tau==0 the initial zero
    state is substituted in-kernel."""
    s = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        dh_scr[:] = dhn_ref[:, :, :]
        dc_scr[:] = dcn_ref[:, :, :]
        dwih_ref[:, :, :] = jnp.zeros_like(dwih_ref)
        dbih_ref[:, :, :] = jnp.zeros_like(dbih_ref)
        dwhh_ref[:, :, :] = jnp.zeros_like(dwhh_ref)
        dbhh_ref[:, :, :] = jnp.zeros_like(dbhh_ref)

    first_step = s == nt - 1  # tau == 0
    for d in range(2):
        x_t = xr_ref[0] if d == 0 else xf_ref[0]
        zero = jnp.zeros_like(hprev_ref[0, d])
        h_prev = jnp.where(first_step, zero, hprev_ref[0, d])
        c_prev = jnp.where(first_step, zero, cprev_ref[0, d])
        c_new = c_ref[0, d]
        m = _span_mask(nt - 1 - s, nt, len_ref, reverse=d == 1)
        gates = (_mxu_dot(x_t, wih_ref[d], precision)
                 + bih_ref[d]
                 + _mxu_dot(h_prev, whh_ref[d], precision)
                 + bhh_ref[d])
        hidden = h_prev.shape[-1]
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c2 = jnp.where(m > 0, c_new, f * c_prev + i * g)
        tanh_c2 = jnp.tanh(c2)

        dh = dh_scr[d] + dout_ref[0, d]
        dc = dc_scr[d]
        dh_step = jnp.where(m > 0, dh, 0.0)
        dc_step = jnp.where(m > 0, dc, 0.0)
        do = dh_step * tanh_c2
        dc2 = dc_step + dh_step * o * (1.0 - tanh_c2 * tanh_c2)
        df = dc2 * c_prev
        di = dc2 * g
        dg = dc2 * i
        dz = jnp.concatenate(
            [di * i * (1.0 - i), df * f * (1.0 - f), dg * (1.0 - g * g),
             do * o * (1.0 - o)], axis=-1)
        dh_prev = (jnp.where(m > 0, 0.0, dh)
                   + _mxu_dot_nt(dz, whh_ref[d], precision))
        dc_prev = jnp.where(m > 0, dc2 * f, dc)
        dx = _mxu_dot_nt(dz, wih_ref[d], precision)
        if d == 0:
            dx0_ref[0] = dx
        else:
            dx1_ref[0] = dx
        dwih_ref[d] += _mxu_dot_tn(x_t, dz, precision)
        dbih_ref[d] += jnp.sum(dz, axis=0, keepdims=True)
        dwhh_ref[d] += _mxu_dot_tn(h_prev, dz, precision)
        dbhh_ref[d] += jnp.sum(dz, axis=0, keepdims=True)
        dh_scr[d] = dh_prev
        dc_scr[d] = dc_prev


def _fwdf_call(x, lengths_f, w_ih, b_ih, w_hh, b_hh, interpret, precision):
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
    outs, cs, h_n, c_n = pl.pallas_call(
        functools.partial(_fwdf_kernel, precision=precision),
        grid=(t,),
        in_specs=[fwd((1, b, f_dim)), bwd((1, b, f_dim)),
                  res((b, 1)),
                  res((2, f_dim, g)), res((2, 1, g)),
                  res((2, hidden, g)), res((2, 1, g))],
        out_specs=[fwd((1, 2, b, hidden)), fwd((1, 2, b, hidden)),
                   res((2, b, hidden)), res((2, b, hidden))],
        out_shape=[jax.ShapeDtypeStruct((t, 2, b, hidden), x.dtype),
                   jax.ShapeDtypeStruct((t, 2, b, hidden), x.dtype),
                   jax.ShapeDtypeStruct((2, b, hidden), x.dtype),
                   jax.ShapeDtypeStruct((2, b, hidden), x.dtype)],
        scratch_shapes=[pltpu.VMEM((2, b, hidden), jnp.float32),
                        pltpu.VMEM((2, b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, lengths_f, w_ih, bih_row, w_hh, bhh_row)
    return outs, cs, h_n, c_n


def _bwdf_call(x, lengths_f, w_ih, b_ih, w_hh, b_hh, outs, cs, douts, dh_n,
               dc_n, interpret, precision):
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
    # douts=None: symbolic-zero outs cotangent (final encoder layer) —
    # one resident zero block instead of a (T,2,B,H) HBM stream
    if douts is None:
        douts = jnp.zeros((1, 2, b, hidden), x.dtype)
        dout_spec = pl.BlockSpec((1, 2, b, hidden),
                                 lambda i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        dout_spec = rev((1, 2, b, hidden))
    (dx0, dx1, dwih, dbih, dwhh, dbhh) = pl.pallas_call(
        functools.partial(_bwdf_kernel, precision=precision),
        grid=(t,),
        in_specs=[rev((1, b, f_dim)), fwd((1, b, f_dim)),
                  res((b, 1)),
                  res((2, f_dim, g)), res((2, 1, g)),
                  res((2, hidden, g)), res((2, 1, g)),
                  shift((1, 2, b, hidden)), shift((1, 2, b, hidden)),
                  rev((1, 2, b, hidden)), dout_spec,
                  res((2, b, hidden)), res((2, b, hidden))],
        out_specs=[rev((1, b, f_dim)), fwd((1, b, f_dim)),
                   res((2, f_dim, g)), res((2, 1, g)),
                   res((2, hidden, g)), res((2, 1, g))],
        out_shape=[jax.ShapeDtypeStruct((t, b, f_dim), x.dtype),
                   jax.ShapeDtypeStruct((t, b, f_dim), x.dtype),
                   jax.ShapeDtypeStruct((2, f_dim, g), x.dtype),
                   jax.ShapeDtypeStruct((2, 1, g), x.dtype),
                   jax.ShapeDtypeStruct((2, hidden, g), x.dtype),
                   jax.ShapeDtypeStruct((2, 1, g), x.dtype)],
        scratch_shapes=[pltpu.VMEM((2, b, hidden), jnp.float32),
                        pltpu.VMEM((2, b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, lengths_f, w_ih, bih_row, w_hh, bhh_row,
      outs, cs, cs, douts, dh_n, dc_n)
    return (dx0 + dx1, dwih, dbih.reshape(2, -1), dwhh,
            dbhh.reshape(2, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _lstm_bidir_fused_cvjp(x, lengths_f, w_ih, b_ih, w_hh, b_hh, interpret,
                           precision):
    outs, cs, h_n, c_n = _fwdf_call(x, lengths_f, w_ih, b_ih, w_hh, b_hh,
                                    interpret, precision)
    return outs, h_n, c_n


def _lstm_bidir_fused_fwd(x, lengths_f, w_ih, b_ih, w_hh, b_hh, interpret,
                          precision):
    x, lengths_f, w_ih, b_ih, w_hh, b_hh = _vjp.primals(
        x, lengths_f, w_ih, b_ih, w_hh, b_hh)
    outs, cs, h_n, c_n = _fwdf_call(x, lengths_f, w_ih, b_ih, w_hh, b_hh,
                                    interpret, precision)
    return (outs, h_n, c_n), (x, lengths_f, w_ih, b_ih, w_hh, b_hh, outs,
                              cs)


def _lstm_bidir_fused_bwd(interpret, precision, residuals, grads):
    x, lengths_f, w_ih, b_ih, w_hh, b_hh, outs, cs = residuals
    douts, dh_n, dc_n = grads
    b, hidden = outs.shape[2], outs.shape[3]
    dx, dwih, dbih, dwhh, dbhh = _bwdf_call(
        x, lengths_f, w_ih, b_ih, w_hh, b_hh, outs, cs,
        None if _vjp.is_sym_zero(douts) else douts,
        _vjp.dense_small(dh_n, (2, b, hidden), x.dtype),
        _vjp.dense_small(dc_n, (2, b, hidden), x.dtype),
        interpret, precision)
    return dx, jnp.zeros_like(lengths_f), dwih, dbih, dwhh, dbhh


_lstm_bidir_fused_cvjp.defvjp(_lstm_bidir_fused_fwd, _lstm_bidir_fused_bwd,
                              symbolic_zeros=True)


def lstm_layer_bidir_fused(x, lengths, w_ih, b_ih, w_hh, b_hh,
                           interpret=False, precision=None):
    """Fully fused bidirectional masked LSTM layer over RAW inputs.

    Args:
      x: (T, B, F) time-major UNprojected inputs (original time order;
        the kernel's index maps read direction 1 reversed).
      lengths: (B,) valid step counts; per-direction step masks are
        synthesized in-kernel from a resident (B, 1) float block
        (ops/_mask_utils.span_mask; direction 1 uses the time-flipped
        interval [T-len, T)).
      w_ih: (2, F, 4H); b_ih: (2, 4H); w_hh: (2, H, 4H); b_hh: (2, 4H).

    Returns (outs (T, 2, B, H) — direction 1 in ITS OWN (flipped) time
    order, h_n (2, B, H), c_n (2, B, H)); numerically matches
    models/rnn.run_rnn_layer_bidir's scan.  Gradients flow to x and all
    four weights (custom VJP, both passes Pallas).
    """
    lengths_f = jnp.asarray(lengths, jnp.float32).reshape(-1, 1)
    return _lstm_bidir_fused_cvjp(x, lengths_f, w_ih, b_ih,
                                  w_hh, b_hh, interpret, precision)

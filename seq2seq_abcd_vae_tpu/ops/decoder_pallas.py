"""Fused Pallas TPU kernel for the autoregressive decoder loop (fwd+bwd).

The decoder hot loop (reference model.py:165-196) is bound by the COUNT
of small sequential matmuls, not FLOPs: every step computes the
recurrent projection, the (pipelined) previous step's emission, samples
the Gaussian feedback input, and projects it onto the gates.  The scan
path (models/decoder.py:_run_direction) already fuses the emission first
layer into the recurrent matmul; this kernel goes further and runs the
WHOLE time loop as one Pallas program:

- grid = (T,): sequential TPU grid; the (h, c) carry lives in VMEM
  scratch, streamed inputs (presampled noise, masks) and the stacked
  hidden-state output are double-buffered automatically;
- every weight — fused recurrent+emission matrix, emission second layer,
  feedback input projection, biases — is resident in VMEM for the whole
  segment batch: one HBM read total instead of T;
- step semantics identical to the scan path: zero first input, sampled
  self-feedback via the same presampled noise layout, masking freezes
  finished rows (packed "shrinking batch" parity, model.py:175-177).

Scope: LSTM, GRU, and Elman-RNN cells (the reference's trainable -R
choices, model.py:53,295), isotropic-Gaussian emission (k=2 parameter
vectors), sample-mode feedback, no input dropout — the hot
configurations.  Other configurations (ESN cells, mean feedback,
dropout, bidirectional) use the scan path; see models/decoder.py
dispatch.

The GRU kernels keep b_ih and b_hh separate (torch GRU semantics: the
candidate gate is tanh(x_n + b_ih_n + r * (h @ w_hh_n + b_hh_n)) — the
recurrent bias rides INSIDE the reset product, model.py:295 via
torch.nn.GRUCell).

The backward kernel runs the adjoint in reverse grid order, recomputing
each step's emission pipeline from the saved (h, c) trajectories, and
accumulates all weight gradients in VMEM.  ``decoder_loop`` wires both
into a ``jax.custom_vjp``.

Parity with the scan path is tested in interpret mode
(tests/test_decoder_pallas.py) and on hardware via
scripts/pallas_grad_parity.py --decoder.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .mxu import mxu_dot as _mxu_dot
from .mxu import mxu_dot_nt as _mxu_dot_nt
from .mxu import mxu_dot_tn as _mxu_dot_tn


def _stream_dtype():
    """dtype for the decoder-loop kernels' saved carry streams.

    ``SEQ2SEQ_STREAM_DTYPE=bf16`` stores the forward's per-step carry
    trajectories — pure backward-recompute inputs, never loss inputs —
    in bfloat16, halving their HBM traffic (LSTM: 2×(T,B,H) hs+cs =
    536 MB/step written fwd + read bwd at the publication shape;
    GRU/Elman: one (T,B,H) hs stream).  Applies to the stream-emission
    AND fused-loss variants of all three cells.  The forward LOSS is
    bit-unchanged; gradients see bf16 rounding of the recompute carries.
    Read at trace time; default f32 keeps exact stream/scan gradient
    parity.  Hardware A/B + parity: PROFILE_r04.json stream_dtype entry.
    """
    return (jnp.bfloat16
            if os.environ.get("SEQ2SEQ_STREAM_DTYPE", "f32") == "bf16"
            else jnp.float32)


def _step_masks(t, len_ref):
    """Synthesize this step's (mask, prev_mask) from row lengths.

    Masks are intervals: step t is active while t < len, and its
    feedback input is gated by prev_mask = (1 <= t) & (t-1 < len).  The
    closed form ``clip(min(t - lo + 1, hi - t), 0, 1)`` is exact for
    integral values, so a (B, 1) float lengths block resident in VMEM
    replaces two streamed (T, B, 1) mask tensors — whose trailing-1
    tiling made every (1, B, 1) block a 128-lane-wide DMA per step, and
    whose XLA-side assembly (pad/shift/convert) cost ~0.8 ms/step at
    the publication shape (round-3 device trace).
    """
    tf = t.astype(jnp.float32)
    ln = len_ref[:, :]
    mt = jnp.clip(jnp.minimum(tf + 1.0, ln - tf), 0.0, 1.0)
    pmt = jnp.clip(jnp.minimum(tf, ln + 1.0 - tf), 0.0, 1.0)
    return mt, pmt


def _fwd_kernel(noise_ref, len_ref, wcat_ref, bias_ref,
                b1_ref, w2m_ref, w2v_ref, b2_ref, wih_ref,
                h0_ref, c0_ref,
                out_ref, hs_ref, cs_ref, mean_ref, logvar_ref,
                h_scr, c_scr,
                *, hidden: int, m: int, precision=None):
    """One decoder step.  Streams: noise (1,B,F) at block max(t-1,0)
    (index-map shift; see _shifted_noise_spec).  Resident: lengths
    (B,1) — step masks synthesized in-kernel (_step_masks),
    wcat (H, 4H+2m), bias (1,4H) = b_ih+b_hh, b1
    (1,2m), w2m/w2v (m,F), b2 (1,2F) = [b2_mean|b2_logvar], wih (F,4H),
    h0/c0 (B,H).  Outputs per step: out = the PRE-mask h2 (scan-path
    parity: padded steps carry candidate values, losses mask
    downstream), hs/cs = the masked carries (backward residuals),
    mean/logvar = the emission parameters computed AT this step, i.e.
    of the carry produced by step t-1 — written directly to POSITION
    slot t-1 by the output index map (step 0's value parks on slot T-1
    for the caller to overwrite).  Emitting them makes the loss
    elementwise downstream — the round-3 trace showed the post-hoc
    (B*T) emission recompute costing ~9 ms/step in relayout copies
    alone, and the downstream shift another ~0.8 ms/step."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:, :].astype(jnp.float32)
        c_scr[:] = c0_ref[:, :].astype(jnp.float32)

    h = h_scr[:]
    c = c_scr[:]
    mt, pmt = _step_masks(t, len_ref)
    big = _mxu_dot(h, wcat_ref[:, :], precision)
    hp = big[:, :4 * hidden]
    emh = jnp.tanh(big[:, 4 * hidden:] + b1_ref[:, :])
    f_dim = w2m_ref.shape[1]
    mean = (_mxu_dot(emh[:, :m], w2m_ref[:, :], precision)
            + b2_ref[:, :f_dim])
    logvar = (_mxu_dot(emh[:, m:], w2v_ref[:, :], precision)
              + b2_ref[:, f_dim:])
    x = mean + jnp.exp(0.5 * logvar) * noise_ref[0]
    x = x * pmt  # zero first input per row
    gates = (hp + _mxu_dot(x, wih_ref[:, :], precision)
             + bias_ref[:, :])
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)
    h = jnp.where(mt > 0, h2, h)
    c = jnp.where(mt > 0, c2, c)
    h_scr[:] = h
    c_scr[:] = c
    out_ref[0] = h2
    hs_ref[0] = h.astype(hs_ref.dtype)
    cs_ref[0] = c.astype(cs_ref.dtype)
    mean_ref[0] = mean
    logvar_ref[0] = logvar


def _bwd_kernel(noise_ref, len_ref, wcat_ref, bias_ref,
                b1_ref, w2m_ref, w2v_ref, b2_ref, wih_ref,
                hprev_ref, cprev_ref, h0_ref, c0_ref, dout_ref,
                dmean_ref, dlogvar_ref,
                dwcat_ref, dbias_ref, db1_ref, dw2m_ref, dw2v_ref,
                db2_ref, dwih_ref, dh0_ref, dc0_ref,
                dh_scr, dc_scr,
                *, hidden: int, m: int, precision=None):
    """Reverse-order grid: program s processes step t = T-1-s,
    recomputing the forward quantities from the saved trajectories.
    hprev/cprev stream hs/cs at block t-1 (clamped index map — no
    host-side shifted copies); at t==0 the resident h0/c0 substitute.
    dmean/dlogvar stream the POSITION-indexed upstream gradients of the
    emitted emission streams at slot t-1 (zeroed in-kernel at t==0,
    whose emission the caller overwrote)."""
    s = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwcat_ref[:, :] = jnp.zeros_like(dwcat_ref)
        dbias_ref[:, :] = jnp.zeros_like(dbias_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        dw2m_ref[:, :] = jnp.zeros_like(dw2m_ref)
        dw2v_ref[:, :] = jnp.zeros_like(dw2v_ref)
        db2_ref[:, :] = jnp.zeros_like(db2_ref)
        dwih_ref[:, :] = jnp.zeros_like(dwih_ref)

    first_step = s == nt - 1  # t == 0
    h_prev = jnp.where(first_step, h0_ref[:, :],
                       hprev_ref[0].astype(jnp.float32))
    c_prev = jnp.where(first_step, c0_ref[:, :],
                       cprev_ref[0].astype(jnp.float32))
    mt, pmt = _step_masks(nt - 1 - s, len_ref)
    eps = noise_ref[0]
    f_dim = w2m_ref.shape[1]

    # ---- forward recompute of this step
    big = _mxu_dot(h_prev, wcat_ref[:, :], precision)
    hp = big[:, :4 * hidden]
    emh = jnp.tanh(big[:, 4 * hidden:] + b1_ref[:, :])
    mean = (_mxu_dot(emh[:, :m], w2m_ref[:, :], precision)
            + b2_ref[:, :f_dim])
    logvar = (_mxu_dot(emh[:, m:], w2v_ref[:, :], precision)
              + b2_ref[:, f_dim:])
    std = jnp.exp(0.5 * logvar)
    x = (mean + std * eps) * pmt
    gates = (hp + _mxu_dot(x, wih_ref[:, :], precision)
             + bias_ref[:, :])
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    # candidate c2 is live at EVERY step (h2 is emitted pre-mask); it is
    # recomputed with the same expression as the forward.
    c2 = f * c_prev + i * g
    tanh_c2 = jnp.tanh(c2)

    # ---- adjoint of:  h2 = cell(h_prev, c_prev, x);
    #                   h  = m ? h2 : h_prev;  c = m ? c2 : c_prev
    dh_carry = dh_scr[:]
    dc_carry = dc_scr[:]
    dh2 = dout_ref[0] + jnp.where(mt > 0, dh_carry, 0.0)

    do = dh2 * tanh_c2
    dc2 = (jnp.where(mt > 0, dc_carry, 0.0)
           + dh2 * o * (1.0 - tanh_c2 * tanh_c2))
    df = dc2 * c_prev
    di = dc2 * g
    dg = dc2 * i
    dz = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f), dg * (1.0 - g * g),
         do * o * (1.0 - o)], axis=-1)

    dx = _mxu_dot_nt(dz, wih_ref[:, :], precision)
    dwih_ref[:, :] += _mxu_dot_tn(x, dz, precision)
    dbias_ref[:, :] += jnp.sum(dz, axis=0, keepdims=True)

    dx = dx * pmt
    # step 0's emission went to the caller-overwritten slot T-1; its
    # upstream grad is exactly zero (the shift3 index map would read
    # slot 0 = step 1's cotangent there instead)
    dmean = dx + jnp.where(first_step, 0.0, dmean_ref[0])
    dlogvar = dx * 0.5 * std * eps + jnp.where(first_step, 0.0,
                                               dlogvar_ref[0])
    db2_ref[:, :f_dim] += jnp.sum(dmean, axis=0, keepdims=True)
    db2_ref[:, f_dim:] += jnp.sum(dlogvar, axis=0, keepdims=True)
    demh_m = _mxu_dot_nt(dmean, w2m_ref[:, :], precision)
    demh_v = _mxu_dot_nt(dlogvar, w2v_ref[:, :], precision)
    dw2m_ref[:, :] += _mxu_dot_tn(emh[:, :m], dmean, precision)
    dw2v_ref[:, :] += _mxu_dot_tn(emh[:, m:], dlogvar, precision)
    demh = jnp.concatenate([demh_m, demh_v], axis=-1)
    dbig_em = demh * (1.0 - emh * emh)
    db1_ref[:, :] += jnp.sum(dbig_em, axis=0, keepdims=True)

    dbig = jnp.concatenate([dz, dbig_em], axis=-1)
    dh_prev = (jnp.where(mt > 0, 0.0, dh_carry)
               + _mxu_dot_nt(dbig, wcat_ref[:, :], precision))
    dc_prev = jnp.where(mt > 0, 0.0, dc_carry) + dc2 * f
    dwcat_ref[:, :] += _mxu_dot_tn(h_prev, dbig, precision)
    dh_scr[:] = dh_prev
    dc_scr[:] = dc_prev

    @pl.when(s == nt - 1)
    def _():
        dh0_ref[:, :] = dh_scr[:]
        dc0_ref[:, :] = dc_scr[:]


def _shifted_noise_spec(t, b, f):
    """Step t consumes the noise that sampled position t-1's emission.
    Streaming block max(t-1, 0) of the UNSHIFTED (T, B, F) noise does
    the shift for free in the index map — the host-side
    [zeros | noise[:-1]] concatenate it replaces cost a full (T, B, F)
    HBM slice+pad pair per step in the round-3 device trace.  The t=0
    block's content is irrelevant: prev_mask zeroes the feedback input
    on every row's first active step."""
    return pl.BlockSpec((1, b, f), lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                        memory_space=pltpu.VMEM)


def _specs(t, b, f, hidden, m, g_all):
    stream3 = lambda shp: pl.BlockSpec(shp, lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
    res = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                   memory_space=pltpu.VMEM)
    ins = [
        _shifted_noise_spec(t, b, f),  # noise (unshifted; see above)
        res((b, 1)),                   # lengths (masks made in-kernel)
        res((hidden, g_all)),          # wcat
        res((1, 4 * hidden)),          # bias (b_ih + b_hh)
        res((1, 2 * m)),               # b1
        res((m, f)),                   # w2 mean
        res((m, f)),                   # w2 logvar
        res((1, 2 * f)),               # b2
        res((f, 4 * hidden)),          # wih
    ]
    return ins, stream3, res


def _fwd_call(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih,
              h0, c0, interpret, precision):
    t, b, f = noise.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - 4 * hidden) // 2
    ins, stream3, res = _specs(t, b, f, hidden, m, g_all)
    # The emission computed AT step t belongs to POSITION t-1 (it is the
    # emission of the carry produced by step t-1), so the kernel writes
    # it there directly: slot map t -> t-1, with step 0 parked on slot
    # T-1 (its emission is the scan path's dropped pre-first-position
    # value; the caller overwrites slot T-1 with the final position's
    # emission).  This removes the downstream full-(T,B,F) slice+pad
    # shift pair per stream measured in the round-3 device trace.
    pos = lambda shp: pl.BlockSpec(
        shp, lambda i: (jnp.where(i == 0, t - 1, i - 1), 0, 0),
        memory_space=pltpu.VMEM)
    outs, hs, cs, mean_s, logvar_s = pl.pallas_call(
        functools.partial(_fwd_kernel, hidden=hidden, m=m,
                          precision=precision),
        grid=(t,),
        in_specs=ins + [res((b, hidden)), res((b, hidden))],
        out_specs=[stream3((1, b, hidden)), stream3((1, b, hidden)),
                   stream3((1, b, hidden)), pos((1, b, f)),
                   pos((1, b, f))],
        out_shape=[jax.ShapeDtypeStruct((t, b, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((t, b, hidden), _stream_dtype()),
                   jax.ShapeDtypeStruct((t, b, hidden), _stream_dtype()),
                   jax.ShapeDtypeStruct((t, b, f), jnp.float32),
                   jax.ShapeDtypeStruct((t, b, f), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32),
                        pltpu.VMEM((b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, h0, c0)
    return outs, hs, cs, mean_s, logvar_s


def _bwd_call(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih,
              h0, c0, hs, cs, douts, dmean_s, dlogvar_s, interpret,
              precision):
    t, b, f = noise.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - 4 * hidden) // 2
    ins, stream3, res = _specs(t, b, f, hidden, m, g_all)
    rev3 = lambda shp: pl.BlockSpec(shp, lambda i: (t - 1 - i, 0, 0),
                                    memory_space=pltpu.VMEM)
    # block t-1, clamped; the kernel substitutes h0/c0 at t==0
    shift3 = lambda shp: pl.BlockSpec(
        shp, lambda i: (jnp.maximum(t - 2 - i, 0), 0, 0),
        memory_space=pltpu.VMEM)
    rev_ins = [
        shift3((1, b, f)),             # noise at t-1 (unshifted input)
    ] + ins[1:] + [
        shift3((1, b, hidden)),        # hs at t-1 -> h_prev
        shift3((1, b, hidden)),        # cs at t-1 -> c_prev
        res((b, hidden)),              # h0
        res((b, hidden)),              # c0
        rev3((1, b, hidden)),          # dout
        # position-indexed upstream grads of the emitted streams: step
        # t's emission lives at slot t-1 (kernel zeroes them at t==0;
        # slot T-1 belongs to the caller's final-position overwrite and
        # is never read here)
        shift3((1, b, f)),             # dmean at t-1
        shift3((1, b, f)),             # dlogvar at t-1
    ]
    out_specs = [
        res((hidden, g_all)), res((1, 4 * hidden)), res((1, 2 * m)),
        res((m, f)), res((m, f)), res((1, 2 * f)), res((f, 4 * hidden)),
        res((b, hidden)), res((b, hidden)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(wcat.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, 4 * hidden), jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * m), jnp.float32),
        jax.ShapeDtypeStruct(w2m.shape, jnp.float32),
        jax.ShapeDtypeStruct(w2v.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * f), jnp.float32),
        jax.ShapeDtypeStruct(wih.shape, jnp.float32),
        jax.ShapeDtypeStruct((b, hidden), jnp.float32),
        jax.ShapeDtypeStruct((b, hidden), jnp.float32),
    ]
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, hidden=hidden, m=m,
                          precision=precision),
        grid=(t,),
        in_specs=rev_ins,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32),
                        pltpu.VMEM((b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih,
      hs, cs, h0, c0, douts, dmean_s, dlogvar_s)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _decoder_loop_cvjp(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                       wih, h0, c0, interpret, precision):
    outs, hs, cs, mean_s, logvar_s = _fwd_call(
        noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, h0, c0,
        interpret, precision)
    return outs, mean_s, logvar_s


def _decoder_loop_fwd(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                      wih, h0, c0, interpret, precision):
    outs, hs, cs, mean_s, logvar_s = _fwd_call(
        noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, h0, c0,
        interpret, precision)
    return (outs, mean_s, logvar_s), (noise, lengths_f, wcat, bias, b1,
                                      w2m, w2v, b2, wih, h0, c0, hs, cs)


def _decoder_loop_bwd(interpret, precision, residuals, grads):
    (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, h0, c0, hs,
     cs) = residuals
    douts, dmean_s, dlogvar_s = grads
    (dwcat, dbias, db1, dw2m, dw2v, db2, dwih, dh0,
     dc0) = _bwd_call(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                      wih, h0, c0, hs, cs, douts, dmean_s, dlogvar_s,
                      interpret, precision)
    return (jnp.zeros_like(noise), jnp.zeros_like(lengths_f),
            dwcat, dbias.reshape(-1),
            db1.reshape(-1), dw2m, dw2v, db2.reshape(-1), dwih, dh0, dc0)


_decoder_loop_cvjp.defvjp(_decoder_loop_fwd, _decoder_loop_bwd)


# ---------------------------------------------------------------------------
# GRU variant.  Differences from LSTM: 3 gates, no cell state, and the
# recurrent bias must stay separate (the candidate gate multiplies the
# recurrent pre-activation INCLUDING b_hh by the reset gate before adding
# the input pre-activation — torch.nn.GRUCell semantics).
# ---------------------------------------------------------------------------

def _gru_fwd_kernel(noise_ref, len_ref, wcat_ref, bih_ref,
                    bhh_ref, b1_ref, w2m_ref, w2v_ref, b2_ref, wih_ref,
                    h0_ref, out_ref, hs_ref, h_scr,
                    *, hidden: int, m: int, precision=None):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:, :].astype(jnp.float32)

    h = h_scr[:]
    mt, pmt = _step_masks(t, len_ref)
    big = _mxu_dot(h, wcat_ref[:, :], precision)
    hp = big[:, :3 * hidden] + bhh_ref[:, :]
    emh = jnp.tanh(big[:, 3 * hidden:] + b1_ref[:, :])
    f_dim = w2m_ref.shape[1]
    mean = (_mxu_dot(emh[:, :m], w2m_ref[:, :], precision)
            + b2_ref[:, :f_dim])
    logvar = (_mxu_dot(emh[:, m:], w2v_ref[:, :], precision)
              + b2_ref[:, f_dim:])
    x = mean + jnp.exp(0.5 * logvar) * noise_ref[0]
    x = x * pmt  # zero first input per row
    xp = (_mxu_dot(x, wih_ref[:, :], precision)
          + bih_ref[:, :])
    r = jax.nn.sigmoid(xp[:, :hidden] + hp[:, :hidden])
    z = jax.nn.sigmoid(xp[:, hidden:2 * hidden]
                       + hp[:, hidden:2 * hidden])
    n = jnp.tanh(xp[:, 2 * hidden:] + r * hp[:, 2 * hidden:])
    h2 = (1.0 - z) * n + z * h
    h = jnp.where(mt > 0, h2, h)
    h_scr[:] = h
    out_ref[0] = h2
    hs_ref[0] = h.astype(hs_ref.dtype)


def _gru_bwd_kernel(noise_ref, len_ref, wcat_ref, bih_ref,
                    bhh_ref, b1_ref, w2m_ref, w2v_ref, b2_ref, wih_ref,
                    hprev_ref, dout_ref,
                    dwcat_ref, dbih_ref, dbhh_ref, db1_ref, dw2m_ref,
                    dw2v_ref, db2_ref, dwih_ref, dh0_ref,
                    dh_scr,
                    *, hidden: int, m: int, precision=None):
    s = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwcat_ref[:, :] = jnp.zeros_like(dwcat_ref)
        dbih_ref[:, :] = jnp.zeros_like(dbih_ref)
        dbhh_ref[:, :] = jnp.zeros_like(dbhh_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        dw2m_ref[:, :] = jnp.zeros_like(dw2m_ref)
        dw2v_ref[:, :] = jnp.zeros_like(dw2v_ref)
        db2_ref[:, :] = jnp.zeros_like(db2_ref)
        dwih_ref[:, :] = jnp.zeros_like(dwih_ref)

    h_prev = hprev_ref[0].astype(jnp.float32)
    mt, pmt = _step_masks(nt - 1 - s, len_ref)
    eps = noise_ref[0]
    f_dim = w2m_ref.shape[1]

    # ---- forward recompute of this step
    big = _mxu_dot(h_prev, wcat_ref[:, :], precision)
    hp = big[:, :3 * hidden] + bhh_ref[:, :]
    emh = jnp.tanh(big[:, 3 * hidden:] + b1_ref[:, :])
    mean = (_mxu_dot(emh[:, :m], w2m_ref[:, :], precision)
            + b2_ref[:, :f_dim])
    logvar = (_mxu_dot(emh[:, m:], w2v_ref[:, :], precision)
              + b2_ref[:, f_dim:])
    std = jnp.exp(0.5 * logvar)
    x = (mean + std * eps) * pmt
    xp = (_mxu_dot(x, wih_ref[:, :], precision)
          + bih_ref[:, :])
    hn = hp[:, 2 * hidden:]
    r = jax.nn.sigmoid(xp[:, :hidden] + hp[:, :hidden])
    z = jax.nn.sigmoid(xp[:, hidden:2 * hidden]
                       + hp[:, hidden:2 * hidden])
    n = jnp.tanh(xp[:, 2 * hidden:] + r * hn)

    # ---- adjoint of:  h2 = (1-z)*n + z*h_prev;  h = m ? h2 : h_prev
    dh_carry = dh_scr[:]
    dh2 = dout_ref[0] + jnp.where(mt > 0, dh_carry, 0.0)
    dn = dh2 * (1.0 - z)
    dz = dh2 * (h_prev - n)
    dh_prev = jnp.where(mt > 0, 0.0, dh_carry) + dh2 * z
    dnpre = dn * (1.0 - n * n)
    dr = dnpre * hn
    dhn = dnpre * r
    dzpre = dz * z * (1.0 - z)
    drpre = dr * r * (1.0 - r)
    dxp = jnp.concatenate([drpre, dzpre, dnpre], axis=-1)
    dhp = jnp.concatenate([drpre, dzpre, dhn], axis=-1)

    dx = _mxu_dot_nt(dxp, wih_ref[:, :], precision)
    dwih_ref[:, :] += _mxu_dot_tn(x, dxp, precision)
    dbih_ref[:, :] += jnp.sum(dxp, axis=0, keepdims=True)
    dbhh_ref[:, :] += jnp.sum(dhp, axis=0, keepdims=True)

    dx = dx * pmt
    dmean = dx
    dlogvar = dx * 0.5 * std * eps
    db2_ref[:, :f_dim] += jnp.sum(dmean, axis=0, keepdims=True)
    db2_ref[:, f_dim:] += jnp.sum(dlogvar, axis=0, keepdims=True)
    demh_m = _mxu_dot_nt(dmean, w2m_ref[:, :], precision)
    demh_v = _mxu_dot_nt(dlogvar, w2v_ref[:, :], precision)
    dw2m_ref[:, :] += _mxu_dot_tn(emh[:, :m], dmean, precision)
    dw2v_ref[:, :] += _mxu_dot_tn(emh[:, m:], dlogvar, precision)
    demh = jnp.concatenate([demh_m, demh_v], axis=-1)
    dbig_em = demh * (1.0 - emh * emh)
    db1_ref[:, :] += jnp.sum(dbig_em, axis=0, keepdims=True)

    dbig = jnp.concatenate([dhp, dbig_em], axis=-1)
    dh_prev = dh_prev + _mxu_dot_nt(dbig, wcat_ref[:, :], precision)
    dwcat_ref[:, :] += _mxu_dot_tn(h_prev, dbig, precision)
    dh_scr[:] = dh_prev

    @pl.when(s == nt - 1)
    def _():
        dh0_ref[:, :] = dh_scr[:]


def _gru_specs(b, f, hidden, m, g_all):
    stream3 = lambda shp: pl.BlockSpec(shp, lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
    res = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                   memory_space=pltpu.VMEM)
    ins = [
        _shifted_noise_spec(0, b, f),  # noise (unshifted; index-map shift)
        res((b, 1)),                   # lengths (masks made in-kernel)
        res((hidden, g_all)),          # wcat
        res((1, 3 * hidden)),          # b_ih
        res((1, 3 * hidden)),          # b_hh
        res((1, 2 * m)),               # b1
        res((m, f)),                   # w2 mean
        res((m, f)),                   # w2 logvar
        res((1, 2 * f)),               # b2
        res((f, 3 * hidden)),          # wih
    ]
    return ins, stream3, res


def _gru_fwd_call(noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2,
                  wih, h0, interpret, precision):
    t, b, f = noise.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - 3 * hidden) // 2
    ins, stream3, res = _gru_specs(b, f, hidden, m, g_all)
    outs, hs = pl.pallas_call(
        functools.partial(_gru_fwd_kernel, hidden=hidden, m=m,
                          precision=precision),
        grid=(t,),
        in_specs=ins + [res((b, hidden))],
        out_specs=[stream3((1, b, hidden)), stream3((1, b, hidden))],
        out_shape=[jax.ShapeDtypeStruct((t, b, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((t, b, hidden),
                                        _stream_dtype())],
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2, wih, h0)
    return outs, hs


def _gru_bwd_call(noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2,
                  wih, h0, hs, douts, interpret, precision):
    t, b, f = noise.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - 3 * hidden) // 2
    ins, stream3, res = _gru_specs(b, f, hidden, m, g_all)
    h_prev = jnp.concatenate([h0[None].astype(hs.dtype), hs[:-1]],
                             axis=0)
    rev3 = lambda shp: pl.BlockSpec(shp, lambda i: (t - 1 - i, 0, 0),
                                    memory_space=pltpu.VMEM)
    shift3 = lambda shp: pl.BlockSpec(
        shp, lambda i: (jnp.maximum(t - 2 - i, 0), 0, 0),
        memory_space=pltpu.VMEM)
    rev_ins = [
        shift3((1, b, f)),             # noise at t-1 (unshifted input)
    ] + ins[1:] + [
        rev3((1, b, hidden)),          # h_prev
        rev3((1, b, hidden)),          # dout
    ]
    out_specs = [
        res((hidden, g_all)), res((1, 3 * hidden)), res((1, 3 * hidden)),
        res((1, 2 * m)), res((m, f)), res((m, f)), res((1, 2 * f)),
        res((f, 3 * hidden)), res((b, hidden)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(wcat.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, 3 * hidden), jnp.float32),
        jax.ShapeDtypeStruct((1, 3 * hidden), jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * m), jnp.float32),
        jax.ShapeDtypeStruct(w2m.shape, jnp.float32),
        jax.ShapeDtypeStruct(w2v.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * f), jnp.float32),
        jax.ShapeDtypeStruct(wih.shape, jnp.float32),
        jax.ShapeDtypeStruct((b, hidden), jnp.float32),
    ]
    grads = pl.pallas_call(
        functools.partial(_gru_bwd_kernel, hidden=hidden, m=m,
                          precision=precision),
        grid=(t,),
        in_specs=rev_ins,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2, wih,
      h_prev, douts)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _gru_loop_cvjp(noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2,
                   wih, h0, interpret, precision):
    outs, hs = _gru_fwd_call(noise, lengths_f, wcat, bih, bhh, b1, w2m,
                             w2v, b2, wih, h0, interpret, precision)
    return outs


def _gru_loop_fwd(noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2,
                  wih, h0, interpret, precision):
    outs, hs = _gru_fwd_call(noise, lengths_f, wcat, bih, bhh, b1, w2m,
                             w2v, b2, wih, h0, interpret, precision)
    return outs, (noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2,
                  wih, h0, hs)


def _gru_loop_bwd(interpret, precision, residuals, douts):
    (noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2, wih, h0,
     hs) = residuals
    (dwcat, dbih, dbhh, db1, dw2m, dw2v, db2, dwih,
     dh0) = _gru_bwd_call(noise, lengths_f, wcat, bih, bhh, b1, w2m,
                          w2v, b2, wih, h0, hs, douts, interpret,
                          precision)
    return (jnp.zeros_like(noise), jnp.zeros_like(lengths_f),
            dwcat, dbih.reshape(-1),
            dbhh.reshape(-1), db1.reshape(-1), dw2m, dw2v,
            db2.reshape(-1), dwih, dh0)


_gru_loop_cvjp.defvjp(_gru_loop_fwd, _gru_loop_bwd)


def gru_decoder_loop(noise, lengths, w_cat, b_ih, b_hh,
                     b1_flat, w2_mean, w2_logvar, b2_flat, w_ih, h0,
                     interpret: bool = False, precision=None):
    """GRU analogue of ``decoder_loop`` (lengths in, masks in-kernel).

    Same streaming layout; w_cat is (H, 3H + 2m), b_ih/b_hh stay separate
    (3H,) because torch's GRU candidate gate is
    tanh(x_n + b_ih_n + r * (h @ w_hh_n + b_hh_n)).  No cell state.
    Returns outs (T, B, H), the PRE-mask candidate h2 per step.
    """
    lengths_f = jnp.asarray(lengths, jnp.float32).reshape(-1, 1)
    return _gru_loop_cvjp(
        noise, lengths_f, w_cat, b_ih.reshape(1, -1),
        b_hh.reshape(1, -1), b1_flat.reshape(1, -1), w2_mean, w2_logvar,
        b2_flat.reshape(1, -1), w_ih, h0, interpret, precision)


# ---------------------------------------------------------------------------
# GRU fused-losses variant (training fast path, mirrors the LSTM
# decoder_loop_fused_losses): emission NLL from streamed position-major
# targets + offset MLP/BCE with the (t == len-1) target synthesized from
# lengths, both accumulated in SMEM scalars; the (T, B, H) outs stream
# collapses to a resident last-step block.  Unlike the plain GRU kernel
# (whose loss path recomputes emissions post-hoc in XLA), this removes
# every per-(B,T) XLA op from the GRU training step.
# ---------------------------------------------------------------------------


def _gru_floss_fwd_kernel(noise_ref, len_ref, wcat_ref, bih_ref,
                          bhh_ref, b1_ref, w2m_ref, w2v_ref, b2_ref,
                          wih_ref, tgt_ref, wo1_ref, bo1_ref, wo2_ref,
                          bo2_ref, h0_ref,
                          out_ref, hs_ref, sc_ref, h_scr,
                          *, hidden: int, m: int,
                          kernel_rng: bool = False, precision=None):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:, :].astype(jnp.float32)
        sc_ref[0, 0] = 0.0
        sc_ref[0, 1] = 0.0

    h = h_scr[:]
    mt, pmt = _step_masks(t, len_ref)
    big = _mxu_dot(h, wcat_ref[:, :], precision)
    hp = big[:, :3 * hidden] + bhh_ref[:, :]
    emh = jnp.tanh(big[:, 3 * hidden:] + b1_ref[:, :])
    f_dim = w2m_ref.shape[1]
    mean = (_mxu_dot(emh[:, :m], w2m_ref[:, :], precision)
            + b2_ref[:, :f_dim])
    logvar = (_mxu_dot(emh[:, m:], w2v_ref[:, :], precision)
              + b2_ref[:, f_dim:])
    if kernel_rng:
        eps = _kernel_noise(noise_ref, jnp.maximum(t - 1, 0),
                            mean.shape)
    else:
        eps = noise_ref[0]
    x = (mean + jnp.exp(0.5 * logvar) * eps) * pmt

    diff = tgt_ref[0] - mean
    nll_t = 0.5 * (_LOG_2PI + logvar + diff * jnp.exp(-logvar) * diff)
    sc_ref[0, 0] += jnp.sum(nll_t * pmt)

    xp = (_mxu_dot(x, wih_ref[:, :], precision)
          + bih_ref[:, :])
    r = jax.nn.sigmoid(xp[:, :hidden] + hp[:, :hidden])
    z = jax.nn.sigmoid(xp[:, hidden:2 * hidden]
                       + hp[:, hidden:2 * hidden])
    n = jnp.tanh(xp[:, 2 * hidden:] + r * hp[:, 2 * hidden:])
    h2 = (1.0 - z) * n + z * h

    oh = jnp.tanh(_mxu_dot(h2, wo1_ref[:, :], precision)
                  + bo1_ref[:, :])
    zo = (jnp.sum(oh * wo2_ref[:, :], axis=1, keepdims=True)
          + bo2_ref[0, 0])
    y = _offset_target(t, len_ref, mt)
    bce = (jnp.maximum(zo, 0.0) - zo * y
           + jnp.log1p(jnp.exp(-jnp.abs(zo))))
    sc_ref[0, 1] += jnp.sum(bce * mt)

    h = jnp.where(mt > 0, h2, h)
    h_scr[:] = h
    out_ref[0] = h2
    hs_ref[0] = h.astype(hs_ref.dtype)


def _gru_floss_bwd_kernel(noise_ref, len_ref, wcat_ref, bih_ref,
                          bhh_ref, b1_ref, w2m_ref, w2v_ref, b2_ref,
                          wih_ref, tgt_ref, wo1_ref, bo1_ref, wo2_ref,
                          bo2_ref, g_ref, hprev_ref, dlast_ref,
                          dwcat_ref, dbih_ref, dbhh_ref, db1_ref,
                          dw2m_ref, dw2v_ref, db2_ref, dwih_ref,
                          dwo1_ref, dbo1_ref, dwo2_ref, dbo2_ref,
                          dh0_ref, dh_scr,
                          *, hidden: int, m: int,
                          kernel_rng: bool = False, precision=None):
    s = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwcat_ref[:, :] = jnp.zeros_like(dwcat_ref)
        dbih_ref[:, :] = jnp.zeros_like(dbih_ref)
        dbhh_ref[:, :] = jnp.zeros_like(dbhh_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        dw2m_ref[:, :] = jnp.zeros_like(dw2m_ref)
        dw2v_ref[:, :] = jnp.zeros_like(dw2v_ref)
        db2_ref[:, :] = jnp.zeros_like(db2_ref)
        dwih_ref[:, :] = jnp.zeros_like(dwih_ref)
        dwo1_ref[:, :] = jnp.zeros_like(dwo1_ref)
        dbo1_ref[:, :] = jnp.zeros_like(dbo1_ref)
        dwo2_ref[:, :] = jnp.zeros_like(dwo2_ref)
        dbo2_ref[0, 0] = 0.0

    h_prev = hprev_ref[0].astype(jnp.float32)
    t_now = nt - 1 - s
    mt, pmt = _step_masks(t_now, len_ref)
    f_dim = w2m_ref.shape[1]
    if kernel_rng:
        eps = _kernel_noise(noise_ref, jnp.maximum(t_now - 1, 0),
                            (h_prev.shape[0], f_dim))
    else:
        eps = noise_ref[0]

    # ---- forward recompute of this step
    big = _mxu_dot(h_prev, wcat_ref[:, :], precision)
    hp = big[:, :3 * hidden] + bhh_ref[:, :]
    emh = jnp.tanh(big[:, 3 * hidden:] + b1_ref[:, :])
    mean = (_mxu_dot(emh[:, :m], w2m_ref[:, :], precision)
            + b2_ref[:, :f_dim])
    logvar = (_mxu_dot(emh[:, m:], w2v_ref[:, :], precision)
              + b2_ref[:, f_dim:])
    std = jnp.exp(0.5 * logvar)
    x = (mean + std * eps) * pmt
    xp = (_mxu_dot(x, wih_ref[:, :], precision)
          + bih_ref[:, :])
    hn = hp[:, 2 * hidden:]
    r = jax.nn.sigmoid(xp[:, :hidden] + hp[:, :hidden])
    z = jax.nn.sigmoid(xp[:, hidden:2 * hidden]
                       + hp[:, hidden:2 * hidden])
    n = jnp.tanh(xp[:, 2 * hidden:] + r * hn)
    h2 = (1.0 - z) * n + z * h_prev

    # ---- offset-MLP recompute + in-register BCE adjoint
    oh = jnp.tanh(_mxu_dot(h2, wo1_ref[:, :], precision)
                  + bo1_ref[:, :])
    zo = (jnp.sum(oh * wo2_ref[:, :], axis=1, keepdims=True)
          + bo2_ref[0, 0])
    y = _offset_target(t_now, len_ref, mt)
    dzo = g_ref[0, 1] * mt * (jax.nn.sigmoid(zo) - y)
    doh = (dzo * wo2_ref[:, :]) * (1.0 - oh * oh)
    dwo1_ref[:, :] += _mxu_dot_tn(h2, doh, precision)
    dbo1_ref[:, :] += jnp.sum(doh, axis=0, keepdims=True)
    dwo2_ref[:, :] += jnp.sum(oh * dzo, axis=0, keepdims=True)
    dbo2_ref[0, 0] += jnp.sum(dzo)

    # ---- adjoint of:  h2 = (1-z)*n + z*h_prev;  h = m ? h2 : h_prev
    dh_carry = dh_scr[:]
    dh2 = (_mxu_dot_nt(doh, wo1_ref[:, :], precision)
           + jnp.where(s == 0, dlast_ref[:, :], 0.0)
           + jnp.where(mt > 0, dh_carry, 0.0))
    dn = dh2 * (1.0 - z)
    dz = dh2 * (h_prev - n)
    dh_prev = jnp.where(mt > 0, 0.0, dh_carry) + dh2 * z
    dnpre = dn * (1.0 - n * n)
    dr = dnpre * hn
    dhn = dnpre * r
    dzpre = dz * z * (1.0 - z)
    drpre = dr * r * (1.0 - r)
    dxp = jnp.concatenate([drpre, dzpre, dnpre], axis=-1)
    dhp = jnp.concatenate([drpre, dzpre, dhn], axis=-1)

    dx = _mxu_dot_nt(dxp, wih_ref[:, :], precision)
    dwih_ref[:, :] += _mxu_dot_tn(x, dxp, precision)
    dbih_ref[:, :] += jnp.sum(dxp, axis=0, keepdims=True)
    dbhh_ref[:, :] += jnp.sum(dhp, axis=0, keepdims=True)

    dx = dx * pmt
    # in-kernel emission-loss cotangents
    gscale = g_ref[0, 0]
    inv_var = jnp.exp(-logvar)
    diff = tgt_ref[0] - mean
    gm = gscale * pmt
    dmean = dx - gm * diff * inv_var
    dlogvar = (dx * 0.5 * std * eps
               + gm * 0.5 * (1.0 - diff * inv_var * diff))
    db2_ref[:, :f_dim] += jnp.sum(dmean, axis=0, keepdims=True)
    db2_ref[:, f_dim:] += jnp.sum(dlogvar, axis=0, keepdims=True)
    demh_m = _mxu_dot_nt(dmean, w2m_ref[:, :], precision)
    demh_v = _mxu_dot_nt(dlogvar, w2v_ref[:, :], precision)
    dw2m_ref[:, :] += _mxu_dot_tn(emh[:, :m], dmean, precision)
    dw2v_ref[:, :] += _mxu_dot_tn(emh[:, m:], dlogvar, precision)
    demh = jnp.concatenate([demh_m, demh_v], axis=-1)
    dbig_em = demh * (1.0 - emh * emh)
    db1_ref[:, :] += jnp.sum(dbig_em, axis=0, keepdims=True)

    dbig = jnp.concatenate([dhp, dbig_em], axis=-1)
    dh_prev = dh_prev + _mxu_dot_nt(dbig, wcat_ref[:, :], precision)
    dwcat_ref[:, :] += _mxu_dot_tn(h_prev, dbig, precision)
    dh_scr[:] = dh_prev

    @pl.when(s == nt - 1)
    def _():
        dh0_ref[:, :] = dh_scr[:]


def _gru_floss_fwd_call(noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v,
                        b2, wih, targets, offset_params, h0, interpret,
                        precision):
    kernel_rng = noise.ndim == 2
    t, b, f = targets.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - 3 * hidden) // 2
    wo1, bo1, wo2, bo2 = offset_params
    mo = wo1.shape[1]
    ins, stream3, res = _gru_specs(b, f, hidden, m, g_all)
    pos = lambda shp: pl.BlockSpec(
        shp, lambda i: (jnp.where(i == 0, t - 1, i - 1), 0, 0),
        memory_space=pltpu.VMEM)
    smem = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.SMEM)
    if kernel_rng:
        ins = [smem((1, 1))] + ins[1:]
    out_last, hs, sc = pl.pallas_call(
        functools.partial(_gru_floss_fwd_kernel, hidden=hidden, m=m,
                          kernel_rng=kernel_rng, precision=precision),
        grid=(t,),
        in_specs=ins + [pos((1, b, f)), res((hidden, mo)), res((1, mo)),
                        res((1, mo)), smem((1, 1)), res((b, hidden))],
        out_specs=[res((1, b, hidden)), stream3((1, b, hidden)),
                   smem((1, 2))],
        out_shape=[jax.ShapeDtypeStruct((1, b, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((t, b, hidden),
                                        _stream_dtype()),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2, wih,
      targets, wo1, bo1, wo2, bo2, h0)
    return out_last, hs, sc


def _gru_floss_bwd_call(noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v,
                        b2, wih, targets, offset_params, h0, hs, dlast,
                        gscale, interpret, precision):
    kernel_rng = noise.ndim == 2
    t, b, f = targets.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - 3 * hidden) // 2
    wo1, bo1, wo2, bo2 = offset_params
    mo = wo1.shape[1]
    ins, stream3, res = _gru_specs(b, f, hidden, m, g_all)
    h_prev = jnp.concatenate([h0[None].astype(hs.dtype), hs[:-1]],
                             axis=0)
    rev3 = lambda shp: pl.BlockSpec(shp, lambda i: (t - 1 - i, 0, 0),
                                    memory_space=pltpu.VMEM)
    shift3 = lambda shp: pl.BlockSpec(
        shp, lambda i: (jnp.maximum(t - 2 - i, 0), 0, 0),
        memory_space=pltpu.VMEM)
    smem = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.SMEM)
    rev_ins = [
        smem((1, 1)) if kernel_rng
        else shift3((1, b, f)),        # noise at t-1 / RNG seed
    ] + ins[1:] + [
        shift3((1, b, f)),             # targets at slot t-1 (pmt-gated)
        res((hidden, mo)), res((1, mo)), res((1, mo)), smem((1, 1)),
        smem((1, 2)),                  # loss cotangent scalars
        rev3((1, b, hidden)),          # h_prev
        res((b, hidden)),              # dlast
    ]
    out_specs = [
        res((hidden, g_all)), res((1, 3 * hidden)), res((1, 3 * hidden)),
        res((1, 2 * m)), res((m, f)), res((m, f)), res((1, 2 * f)),
        res((f, 3 * hidden)),
        res((hidden, mo)), res((1, mo)), res((1, mo)), smem((1, 1)),
        res((b, hidden)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(wcat.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, 3 * hidden), jnp.float32),
        jax.ShapeDtypeStruct((1, 3 * hidden), jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * m), jnp.float32),
        jax.ShapeDtypeStruct(w2m.shape, jnp.float32),
        jax.ShapeDtypeStruct(w2v.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * f), jnp.float32),
        jax.ShapeDtypeStruct(wih.shape, jnp.float32),
        jax.ShapeDtypeStruct((hidden, mo), jnp.float32),
        jax.ShapeDtypeStruct((1, mo), jnp.float32),
        jax.ShapeDtypeStruct((1, mo), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, hidden), jnp.float32),
    ]
    grads = pl.pallas_call(
        functools.partial(_gru_floss_bwd_kernel, hidden=hidden, m=m,
                          kernel_rng=kernel_rng, precision=precision),
        grid=(t,),
        in_specs=rev_ins,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2, wih,
      targets, wo1, bo1, wo2, bo2, gscale, h_prev, dlast)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17))
def _gru_floss_cvjp(noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2,
                    wih, targets, wo1, bo1, wo2, bo2, h0, interpret,
                    precision):
    out_last, hs, sc = _gru_floss_fwd_call(
        noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2, wih,
        targets, (wo1, bo1, wo2, bo2), h0, interpret, precision)
    return out_last[0], sc[0, 0], sc[0, 1]


def _gru_floss_fwd(noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2,
                   wih, targets, wo1, bo1, wo2, bo2, h0, interpret,
                   precision):
    out_last, hs, sc = _gru_floss_fwd_call(
        noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2, wih,
        targets, (wo1, bo1, wo2, bo2), h0, interpret, precision)
    return ((out_last[0], sc[0, 0], sc[0, 1]),
            (noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2, wih,
             targets, wo1, bo1, wo2, bo2, h0, hs))


def _gru_floss_bwd(interpret, precision, residuals, grads):
    (noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2, wih, targets,
     wo1, bo1, wo2, bo2, h0, hs) = residuals
    dlast, dnll, dbce = grads
    gscale = jnp.stack([jnp.asarray(dnll, jnp.float32),
                        jnp.asarray(dbce, jnp.float32)]).reshape(1, 2)
    (dwcat, dbih, dbhh, db1, dw2m, dw2v, db2, dwih, dwo1, dbo1, dwo2,
     dbo2, dh0) = _gru_floss_bwd_call(
        noise, lengths_f, wcat, bih, bhh, b1, w2m, w2v, b2, wih,
        targets, (wo1, bo1, wo2, bo2), h0, hs, dlast, gscale, interpret,
        precision)
    return (jnp.zeros_like(noise), jnp.zeros_like(lengths_f),
            dwcat, dbih.reshape(-1), dbhh.reshape(-1), db1.reshape(-1),
            dw2m, dw2v, db2.reshape(-1), dwih, jnp.zeros_like(targets),
            dwo1, dbo1, dwo2, dbo2, dh0)


_gru_floss_cvjp.defvjp(_gru_floss_fwd, _gru_floss_bwd)


def gru_decoder_loop_fused_losses(noise, lengths, w_cat, b_ih, b_hh,
                                  b1_flat, w2_mean, w2_logvar, b2_flat,
                                  w_ih, targets, wo1, bo1, wo2, bo2, h0,
                                  interpret: bool = False,
                                  precision=None):
    """GRU analogue of ``decoder_loop_fused_losses`` (emission NLL +
    offset MLP/BCE fused in-kernel, (t == len-1) target synthesized from
    lengths, outs stream collapsed to a resident last-step block).
    ``noise`` is either the (T, B, F) presampled stream or the (1, 1)
    f32 seed (SEQ2SEQ_KERNEL_RNG).  Returns (out_last (B, H), nll
    covering positions 0..T-2, bce covering all positions)."""
    lengths_f = jnp.asarray(lengths, jnp.float32).reshape(-1, 1)
    return _gru_floss_cvjp(
        noise, lengths_f, w_cat, b_ih.reshape(1, -1),
        b_hh.reshape(1, -1), b1_flat.reshape(1, -1), w2_mean, w2_logvar,
        b2_flat.reshape(1, -1), w_ih, targets, wo1, bo1, wo2, bo2, h0,
        interpret, precision)


# ---------------------------------------------------------------------------
# Elman-RNN variant.  Single tanh gate, no cell state; like LSTM the two
# biases simply add (h2 = tanh(x W_ih + b_ih + h W_hh + b_hh),
# torch.nn.RNNCell), so the kernel takes bias = b_ih + b_hh.
#
# A static ``leak`` (default 1.0 = plain Elman, compiled away) generalizes
# the same kernels to the ESN decoder cell (reference model.py:444,529-531:
# h' = (1-leak) h + leak tanh(x W_ih + h W_hh), no biases — the caller
# passes bias = 0).  The reservoir weights are frozen OUTSIDE the kernel
# (stop_gradient in models/decoder.py), so the weight cotangents the
# backward kernel computes are simply dropped by XLA for ESN.
# ---------------------------------------------------------------------------

def _rnn_fwd_kernel(noise_ref, len_ref, wcat_ref, bias_ref,
                    b1_ref, w2m_ref, w2v_ref, b2_ref, wih_ref,
                    h0_ref, out_ref, hs_ref, h_scr,
                    *, hidden: int, m: int, leak: float = 1.0,
                    precision=None):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:, :].astype(jnp.float32)

    h = h_scr[:]
    mt, pmt = _step_masks(t, len_ref)
    big = _mxu_dot(h, wcat_ref[:, :], precision)
    hp = big[:, :hidden]
    emh = jnp.tanh(big[:, hidden:] + b1_ref[:, :])
    f_dim = w2m_ref.shape[1]
    mean = (_mxu_dot(emh[:, :m], w2m_ref[:, :], precision)
            + b2_ref[:, :f_dim])
    logvar = (_mxu_dot(emh[:, m:], w2v_ref[:, :], precision)
              + b2_ref[:, f_dim:])
    x = mean + jnp.exp(0.5 * logvar) * noise_ref[0]
    x = x * pmt  # zero first input per row
    u = jnp.tanh(hp + _mxu_dot(x, wih_ref[:, :], precision)
                 + bias_ref[:, :])
    h2 = u if leak == 1.0 else (1.0 - leak) * h + leak * u
    h = jnp.where(mt > 0, h2, h)
    h_scr[:] = h
    out_ref[0] = h2
    hs_ref[0] = h.astype(hs_ref.dtype)


def _rnn_bwd_kernel(noise_ref, len_ref, wcat_ref, bias_ref,
                    b1_ref, w2m_ref, w2v_ref, b2_ref, wih_ref,
                    hprev_ref, dout_ref,
                    dwcat_ref, dbias_ref, db1_ref, dw2m_ref, dw2v_ref,
                    db2_ref, dwih_ref, dh0_ref,
                    dh_scr,
                    *, hidden: int, m: int, leak: float = 1.0,
                    precision=None):
    s = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwcat_ref[:, :] = jnp.zeros_like(dwcat_ref)
        dbias_ref[:, :] = jnp.zeros_like(dbias_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        dw2m_ref[:, :] = jnp.zeros_like(dw2m_ref)
        dw2v_ref[:, :] = jnp.zeros_like(dw2v_ref)
        db2_ref[:, :] = jnp.zeros_like(db2_ref)
        dwih_ref[:, :] = jnp.zeros_like(dwih_ref)

    h_prev = hprev_ref[0].astype(jnp.float32)
    mt, pmt = _step_masks(nt - 1 - s, len_ref)
    eps = noise_ref[0]
    f_dim = w2m_ref.shape[1]

    # ---- forward recompute of this step
    big = _mxu_dot(h_prev, wcat_ref[:, :], precision)
    hp = big[:, :hidden]
    emh = jnp.tanh(big[:, hidden:] + b1_ref[:, :])
    mean = (_mxu_dot(emh[:, :m], w2m_ref[:, :], precision)
            + b2_ref[:, :f_dim])
    logvar = (_mxu_dot(emh[:, m:], w2v_ref[:, :], precision)
              + b2_ref[:, f_dim:])
    std = jnp.exp(0.5 * logvar)
    x = (mean + std * eps) * pmt
    u = jnp.tanh(hp + _mxu_dot(x, wih_ref[:, :], precision)
                 + bias_ref[:, :])

    # ---- adjoint of:  h2 = (1-leak) h_prev + leak tanh(pre);
    #                   h = m ? h2 : h_prev        (leak=1: h2 = tanh)
    dh_carry = dh_scr[:]
    dh2 = dout_ref[0] + jnp.where(mt > 0, dh_carry, 0.0)
    dpre = (dh2 if leak == 1.0 else leak * dh2) * (1.0 - u * u)
    dh_prev = jnp.where(mt > 0, 0.0, dh_carry)
    if leak != 1.0:
        dh_prev = dh_prev + (1.0 - leak) * dh2

    dx = _mxu_dot_nt(dpre, wih_ref[:, :], precision)
    dwih_ref[:, :] += _mxu_dot_tn(x, dpre, precision)
    dbias_ref[:, :] += jnp.sum(dpre, axis=0, keepdims=True)

    dx = dx * pmt
    dmean = dx
    dlogvar = dx * 0.5 * std * eps
    db2_ref[:, :f_dim] += jnp.sum(dmean, axis=0, keepdims=True)
    db2_ref[:, f_dim:] += jnp.sum(dlogvar, axis=0, keepdims=True)
    demh_m = _mxu_dot_nt(dmean, w2m_ref[:, :], precision)
    demh_v = _mxu_dot_nt(dlogvar, w2v_ref[:, :], precision)
    dw2m_ref[:, :] += _mxu_dot_tn(emh[:, :m], dmean, precision)
    dw2v_ref[:, :] += _mxu_dot_tn(emh[:, m:], dlogvar, precision)
    demh = jnp.concatenate([demh_m, demh_v], axis=-1)
    dbig_em = demh * (1.0 - emh * emh)
    db1_ref[:, :] += jnp.sum(dbig_em, axis=0, keepdims=True)

    dbig = jnp.concatenate([dpre, dbig_em], axis=-1)
    dh_prev = dh_prev + _mxu_dot_nt(dbig, wcat_ref[:, :], precision)
    dwcat_ref[:, :] += _mxu_dot_tn(h_prev, dbig, precision)
    dh_scr[:] = dh_prev

    @pl.when(s == nt - 1)
    def _():
        dh0_ref[:, :] = dh_scr[:]


def _rnn_specs(b, f, hidden, m, g_all):
    stream3 = lambda shp: pl.BlockSpec(shp, lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
    res = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                   memory_space=pltpu.VMEM)
    ins = [
        _shifted_noise_spec(0, b, f),  # noise (unshifted; index-map shift)
        res((b, 1)),                   # lengths (masks made in-kernel)
        res((hidden, g_all)),          # wcat
        res((1, hidden)),              # bias (b_ih + b_hh)
        res((1, 2 * m)),               # b1
        res((m, f)),                   # w2 mean
        res((m, f)),                   # w2 logvar
        res((1, 2 * f)),               # b2
        res((f, hidden)),              # wih
    ]
    return ins, stream3, res


def _rnn_fwd_call(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                  wih, h0, interpret, precision, leak=1.0):
    t, b, f = noise.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - hidden) // 2
    ins, stream3, res = _rnn_specs(b, f, hidden, m, g_all)
    outs, hs = pl.pallas_call(
        functools.partial(_rnn_fwd_kernel, hidden=hidden, m=m, leak=leak,
                          precision=precision),
        grid=(t,),
        in_specs=ins + [res((b, hidden))],
        out_specs=[stream3((1, b, hidden)), stream3((1, b, hidden))],
        out_shape=[jax.ShapeDtypeStruct((t, b, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((t, b, hidden),
                                        _stream_dtype())],
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, h0)
    return outs, hs


def _rnn_bwd_call(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                  wih, h0, hs, douts, interpret, precision, leak=1.0):
    t, b, f = noise.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - hidden) // 2
    ins, stream3, res = _rnn_specs(b, f, hidden, m, g_all)
    h_prev = jnp.concatenate([h0[None].astype(hs.dtype), hs[:-1]],
                             axis=0)
    rev3 = lambda shp: pl.BlockSpec(shp, lambda i: (t - 1 - i, 0, 0),
                                    memory_space=pltpu.VMEM)
    shift3 = lambda shp: pl.BlockSpec(
        shp, lambda i: (jnp.maximum(t - 2 - i, 0), 0, 0),
        memory_space=pltpu.VMEM)
    rev_ins = [
        shift3((1, b, f)),             # noise at t-1 (unshifted input)
    ] + ins[1:] + [
        rev3((1, b, hidden)),          # h_prev
        rev3((1, b, hidden)),          # dout
    ]
    out_specs = [
        res((hidden, g_all)), res((1, hidden)),
        res((1, 2 * m)), res((m, f)), res((m, f)), res((1, 2 * f)),
        res((f, hidden)), res((b, hidden)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(wcat.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, hidden), jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * m), jnp.float32),
        jax.ShapeDtypeStruct(w2m.shape, jnp.float32),
        jax.ShapeDtypeStruct(w2v.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * f), jnp.float32),
        jax.ShapeDtypeStruct(wih.shape, jnp.float32),
        jax.ShapeDtypeStruct((b, hidden), jnp.float32),
    ]
    grads = pl.pallas_call(
        functools.partial(_rnn_bwd_kernel, hidden=hidden, m=m, leak=leak,
                          precision=precision),
        grid=(t,),
        in_specs=rev_ins,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih,
      h_prev, douts)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _rnn_loop_cvjp(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                   wih, h0, interpret, precision, leak):
    outs, hs = _rnn_fwd_call(noise, lengths_f, wcat, bias, b1, w2m,
                             w2v, b2, wih, h0, interpret, precision,
                             leak)
    return outs


def _rnn_loop_fwd(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                  wih, h0, interpret, precision, leak):
    outs, hs = _rnn_fwd_call(noise, lengths_f, wcat, bias, b1, w2m,
                             w2v, b2, wih, h0, interpret, precision,
                             leak)
    return outs, (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                  wih, h0, hs)


def _rnn_loop_bwd(interpret, precision, leak, residuals, douts):
    (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, h0,
     hs) = residuals
    (dwcat, dbias, db1, dw2m, dw2v, db2, dwih,
     dh0) = _rnn_bwd_call(noise, lengths_f, wcat, bias, b1, w2m,
                          w2v, b2, wih, h0, hs, douts, interpret,
                          precision, leak)
    return (jnp.zeros_like(noise), jnp.zeros_like(lengths_f),
            dwcat, dbias.reshape(-1),
            db1.reshape(-1), dw2m, dw2v, db2.reshape(-1), dwih, dh0)


_rnn_loop_cvjp.defvjp(_rnn_loop_fwd, _rnn_loop_bwd)


def rnn_decoder_loop(noise, lengths, w_cat, bias, b1_flat,
                     w2_mean, w2_logvar, b2_flat, w_ih, h0,
                     interpret: bool = False, precision=None,
                     leak: float = 1.0):
    """Elman-RNN analogue of ``decoder_loop`` (lengths in, masks
    in-kernel).

    Same streaming layout; w_cat is (H, H + 2m), bias = b_ih + b_hh
    (torch.nn.RNNCell: the biases simply add inside the tanh).  No cell
    state.  Returns outs (T, B, H), the PRE-mask candidate h2 per step.

    ``leak`` < 1.0 selects the ESN cell (model.py:444,529-531):
    h2 = (1-leak) h + leak tanh(...); pass bias = 0 (ESN has no biases).
    """
    lengths_f = jnp.asarray(lengths, jnp.float32).reshape(-1, 1)
    return _rnn_loop_cvjp(
        noise, lengths_f, w_cat, bias.reshape(1, -1),
        b1_flat.reshape(1, -1), w2_mean, w2_logvar,
        b2_flat.reshape(1, -1), w_ih, h0, interpret, precision, leak)


# ---------------------------------------------------------------------------
# Elman fused-losses variant (training fast path; mirrors the LSTM/GRU
# decoder_loop_fused_losses: emission NLL + offset MLP/BCE in SMEM
# scalars, outs collapsed to a resident last-step block).
# ---------------------------------------------------------------------------


def _rnn_floss_fwd_kernel(noise_ref, len_ref, wcat_ref, bias_ref,
                          b1_ref, w2m_ref, w2v_ref, b2_ref, wih_ref,
                          tgt_ref, wo1_ref, bo1_ref, wo2_ref, bo2_ref,
                          h0_ref, out_ref, hs_ref, sc_ref, h_scr,
                          *, hidden: int, m: int, leak: float = 1.0,
                          kernel_rng: bool = False, precision=None):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:, :].astype(jnp.float32)
        sc_ref[0, 0] = 0.0
        sc_ref[0, 1] = 0.0

    h = h_scr[:]
    mt, pmt = _step_masks(t, len_ref)
    big = _mxu_dot(h, wcat_ref[:, :], precision)
    hp = big[:, :hidden]
    emh = jnp.tanh(big[:, hidden:] + b1_ref[:, :])
    f_dim = w2m_ref.shape[1]
    mean = (_mxu_dot(emh[:, :m], w2m_ref[:, :], precision)
            + b2_ref[:, :f_dim])
    logvar = (_mxu_dot(emh[:, m:], w2v_ref[:, :], precision)
              + b2_ref[:, f_dim:])
    if kernel_rng:
        eps = _kernel_noise(noise_ref, jnp.maximum(t - 1, 0),
                            mean.shape)
    else:
        eps = noise_ref[0]
    x = (mean + jnp.exp(0.5 * logvar) * eps) * pmt

    diff = tgt_ref[0] - mean
    nll_t = 0.5 * (_LOG_2PI + logvar + diff * jnp.exp(-logvar) * diff)
    sc_ref[0, 0] += jnp.sum(nll_t * pmt)

    u = jnp.tanh(hp + _mxu_dot(x, wih_ref[:, :], precision)
                 + bias_ref[:, :])
    h2 = u if leak == 1.0 else (1.0 - leak) * h + leak * u

    oh = jnp.tanh(_mxu_dot(h2, wo1_ref[:, :], precision)
                  + bo1_ref[:, :])
    zo = (jnp.sum(oh * wo2_ref[:, :], axis=1, keepdims=True)
          + bo2_ref[0, 0])
    y = _offset_target(t, len_ref, mt)
    bce = (jnp.maximum(zo, 0.0) - zo * y
           + jnp.log1p(jnp.exp(-jnp.abs(zo))))
    sc_ref[0, 1] += jnp.sum(bce * mt)

    h = jnp.where(mt > 0, h2, h)
    h_scr[:] = h
    out_ref[0] = h2
    hs_ref[0] = h.astype(hs_ref.dtype)


def _rnn_floss_bwd_kernel(noise_ref, len_ref, wcat_ref, bias_ref,
                          b1_ref, w2m_ref, w2v_ref, b2_ref, wih_ref,
                          tgt_ref, wo1_ref, bo1_ref, wo2_ref, bo2_ref,
                          g_ref, hprev_ref, dlast_ref,
                          dwcat_ref, dbias_ref, db1_ref, dw2m_ref,
                          dw2v_ref, db2_ref, dwih_ref,
                          dwo1_ref, dbo1_ref, dwo2_ref, dbo2_ref,
                          dh0_ref, dh_scr,
                          *, hidden: int, m: int, leak: float = 1.0,
                          kernel_rng: bool = False, precision=None):
    s = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwcat_ref[:, :] = jnp.zeros_like(dwcat_ref)
        dbias_ref[:, :] = jnp.zeros_like(dbias_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        dw2m_ref[:, :] = jnp.zeros_like(dw2m_ref)
        dw2v_ref[:, :] = jnp.zeros_like(dw2v_ref)
        db2_ref[:, :] = jnp.zeros_like(db2_ref)
        dwih_ref[:, :] = jnp.zeros_like(dwih_ref)
        dwo1_ref[:, :] = jnp.zeros_like(dwo1_ref)
        dbo1_ref[:, :] = jnp.zeros_like(dbo1_ref)
        dwo2_ref[:, :] = jnp.zeros_like(dwo2_ref)
        dbo2_ref[0, 0] = 0.0

    h_prev = hprev_ref[0].astype(jnp.float32)
    t_now = nt - 1 - s
    mt, pmt = _step_masks(t_now, len_ref)
    f_dim = w2m_ref.shape[1]
    if kernel_rng:
        eps = _kernel_noise(noise_ref, jnp.maximum(t_now - 1, 0),
                            (h_prev.shape[0], f_dim))
    else:
        eps = noise_ref[0]

    # ---- forward recompute of this step
    big = _mxu_dot(h_prev, wcat_ref[:, :], precision)
    hp = big[:, :hidden]
    emh = jnp.tanh(big[:, hidden:] + b1_ref[:, :])
    mean = (_mxu_dot(emh[:, :m], w2m_ref[:, :], precision)
            + b2_ref[:, :f_dim])
    logvar = (_mxu_dot(emh[:, m:], w2v_ref[:, :], precision)
              + b2_ref[:, f_dim:])
    std = jnp.exp(0.5 * logvar)
    x = (mean + std * eps) * pmt
    u = jnp.tanh(hp + _mxu_dot(x, wih_ref[:, :], precision)
                 + bias_ref[:, :])
    h2 = u if leak == 1.0 else (1.0 - leak) * h_prev + leak * u

    # ---- offset-MLP recompute + in-register BCE adjoint
    oh = jnp.tanh(_mxu_dot(h2, wo1_ref[:, :], precision)
                  + bo1_ref[:, :])
    zo = (jnp.sum(oh * wo2_ref[:, :], axis=1, keepdims=True)
          + bo2_ref[0, 0])
    y = _offset_target(t_now, len_ref, mt)
    dzo = g_ref[0, 1] * mt * (jax.nn.sigmoid(zo) - y)
    doh = (dzo * wo2_ref[:, :]) * (1.0 - oh * oh)
    dwo1_ref[:, :] += _mxu_dot_tn(h2, doh, precision)
    dbo1_ref[:, :] += jnp.sum(doh, axis=0, keepdims=True)
    dwo2_ref[:, :] += jnp.sum(oh * dzo, axis=0, keepdims=True)
    dbo2_ref[0, 0] += jnp.sum(dzo)

    # ---- adjoint of:  h2 = (1-leak) h_prev + leak tanh(pre);
    #                   h = m ? h2 : h_prev        (leak=1: h2 = tanh)
    dh_carry = dh_scr[:]
    dh2 = (_mxu_dot_nt(doh, wo1_ref[:, :], precision)
           + jnp.where(s == 0, dlast_ref[:, :], 0.0)
           + jnp.where(mt > 0, dh_carry, 0.0))
    dpre = (dh2 if leak == 1.0 else leak * dh2) * (1.0 - u * u)
    dh_prev = jnp.where(mt > 0, 0.0, dh_carry)
    if leak != 1.0:
        dh_prev = dh_prev + (1.0 - leak) * dh2

    dx = _mxu_dot_nt(dpre, wih_ref[:, :], precision)
    dwih_ref[:, :] += _mxu_dot_tn(x, dpre, precision)
    dbias_ref[:, :] += jnp.sum(dpre, axis=0, keepdims=True)

    dx = dx * pmt
    gscale = g_ref[0, 0]
    inv_var = jnp.exp(-logvar)
    diff = tgt_ref[0] - mean
    gm = gscale * pmt
    dmean = dx - gm * diff * inv_var
    dlogvar = (dx * 0.5 * std * eps
               + gm * 0.5 * (1.0 - diff * inv_var * diff))
    db2_ref[:, :f_dim] += jnp.sum(dmean, axis=0, keepdims=True)
    db2_ref[:, f_dim:] += jnp.sum(dlogvar, axis=0, keepdims=True)
    demh_m = _mxu_dot_nt(dmean, w2m_ref[:, :], precision)
    demh_v = _mxu_dot_nt(dlogvar, w2v_ref[:, :], precision)
    dw2m_ref[:, :] += _mxu_dot_tn(emh[:, :m], dmean, precision)
    dw2v_ref[:, :] += _mxu_dot_tn(emh[:, m:], dlogvar, precision)
    demh = jnp.concatenate([demh_m, demh_v], axis=-1)
    dbig_em = demh * (1.0 - emh * emh)
    db1_ref[:, :] += jnp.sum(dbig_em, axis=0, keepdims=True)

    dbig = jnp.concatenate([dpre, dbig_em], axis=-1)
    dh_prev = dh_prev + _mxu_dot_nt(dbig, wcat_ref[:, :], precision)
    dwcat_ref[:, :] += _mxu_dot_tn(h_prev, dbig, precision)
    dh_scr[:] = dh_prev

    @pl.when(s == nt - 1)
    def _():
        dh0_ref[:, :] = dh_scr[:]


def _rnn_floss_fwd_call(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                        wih, targets, offset_params, h0, interpret,
                        precision, leak=1.0):
    kernel_rng = noise.ndim == 2
    t, b, f = targets.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - hidden) // 2
    wo1, bo1, wo2, bo2 = offset_params
    mo = wo1.shape[1]
    ins, stream3, res = _rnn_specs(b, f, hidden, m, g_all)
    pos = lambda shp: pl.BlockSpec(
        shp, lambda i: (jnp.where(i == 0, t - 1, i - 1), 0, 0),
        memory_space=pltpu.VMEM)
    smem = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.SMEM)
    if kernel_rng:
        ins = [smem((1, 1))] + ins[1:]
    out_last, hs, sc = pl.pallas_call(
        functools.partial(_rnn_floss_fwd_kernel, hidden=hidden, m=m,
                          leak=leak, kernel_rng=kernel_rng,
                          precision=precision),
        grid=(t,),
        in_specs=ins + [pos((1, b, f)), res((hidden, mo)), res((1, mo)),
                        res((1, mo)), smem((1, 1)), res((b, hidden))],
        out_specs=[res((1, b, hidden)), stream3((1, b, hidden)),
                   smem((1, 2))],
        out_shape=[jax.ShapeDtypeStruct((1, b, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((t, b, hidden),
                                        _stream_dtype()),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih,
      targets, wo1, bo1, wo2, bo2, h0)
    return out_last, hs, sc


def _rnn_floss_bwd_call(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                        wih, targets, offset_params, h0, hs, dlast,
                        gscale, interpret, precision, leak=1.0):
    kernel_rng = noise.ndim == 2
    t, b, f = targets.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - hidden) // 2
    wo1, bo1, wo2, bo2 = offset_params
    mo = wo1.shape[1]
    ins, stream3, res = _rnn_specs(b, f, hidden, m, g_all)
    h_prev = jnp.concatenate([h0[None].astype(hs.dtype), hs[:-1]],
                             axis=0)
    rev3 = lambda shp: pl.BlockSpec(shp, lambda i: (t - 1 - i, 0, 0),
                                    memory_space=pltpu.VMEM)
    shift3 = lambda shp: pl.BlockSpec(
        shp, lambda i: (jnp.maximum(t - 2 - i, 0), 0, 0),
        memory_space=pltpu.VMEM)
    smem = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.SMEM)
    rev_ins = [
        smem((1, 1)) if kernel_rng
        else shift3((1, b, f)),        # noise at t-1 / RNG seed
    ] + ins[1:] + [
        shift3((1, b, f)),             # targets at slot t-1 (pmt-gated)
        res((hidden, mo)), res((1, mo)), res((1, mo)), smem((1, 1)),
        smem((1, 2)),                  # loss cotangent scalars
        rev3((1, b, hidden)),          # h_prev
        res((b, hidden)),              # dlast
    ]
    out_specs = [
        res((hidden, g_all)), res((1, hidden)), res((1, 2 * m)),
        res((m, f)), res((m, f)), res((1, 2 * f)), res((f, hidden)),
        res((hidden, mo)), res((1, mo)), res((1, mo)), smem((1, 1)),
        res((b, hidden)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(wcat.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, hidden), jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * m), jnp.float32),
        jax.ShapeDtypeStruct(w2m.shape, jnp.float32),
        jax.ShapeDtypeStruct(w2v.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * f), jnp.float32),
        jax.ShapeDtypeStruct(wih.shape, jnp.float32),
        jax.ShapeDtypeStruct((hidden, mo), jnp.float32),
        jax.ShapeDtypeStruct((1, mo), jnp.float32),
        jax.ShapeDtypeStruct((1, mo), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, hidden), jnp.float32),
    ]
    grads = pl.pallas_call(
        functools.partial(_rnn_floss_bwd_kernel, hidden=hidden, m=m,
                          leak=leak, kernel_rng=kernel_rng,
                          precision=precision),
        grid=(t,),
        in_specs=rev_ins,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih,
      targets, wo1, bo1, wo2, bo2, gscale, h_prev, dlast)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17))
def _rnn_floss_cvjp(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                    wih, targets, wo1, bo1, wo2, bo2, h0, interpret,
                    precision, leak):
    out_last, hs, sc = _rnn_floss_fwd_call(
        noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets,
        (wo1, bo1, wo2, bo2), h0, interpret, precision, leak)
    return out_last[0], sc[0, 0], sc[0, 1]


def _rnn_floss_fwd(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                   wih, targets, wo1, bo1, wo2, bo2, h0, interpret,
                   precision, leak):
    out_last, hs, sc = _rnn_floss_fwd_call(
        noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets,
        (wo1, bo1, wo2, bo2), h0, interpret, precision, leak)
    return ((out_last[0], sc[0, 0], sc[0, 1]),
            (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih,
             targets, wo1, bo1, wo2, bo2, h0, hs))


def _rnn_floss_bwd(interpret, precision, leak, residuals, grads):
    (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets,
     wo1, bo1, wo2, bo2, h0, hs) = residuals
    dlast, dnll, dbce = grads
    gscale = jnp.stack([jnp.asarray(dnll, jnp.float32),
                        jnp.asarray(dbce, jnp.float32)]).reshape(1, 2)
    (dwcat, dbias, db1, dw2m, dw2v, db2, dwih, dwo1, dbo1, dwo2, dbo2,
     dh0) = _rnn_floss_bwd_call(
        noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets,
        (wo1, bo1, wo2, bo2), h0, hs, dlast, gscale, interpret,
        precision, leak)
    return (jnp.zeros_like(noise), jnp.zeros_like(lengths_f),
            dwcat, dbias.reshape(-1), db1.reshape(-1), dw2m, dw2v,
            db2.reshape(-1), dwih, jnp.zeros_like(targets),
            dwo1, dbo1, dwo2, dbo2, dh0)


_rnn_floss_cvjp.defvjp(_rnn_floss_fwd, _rnn_floss_bwd)


def rnn_decoder_loop_fused_losses(noise, lengths, w_cat, bias, b1_flat,
                                  w2_mean, w2_logvar, b2_flat, w_ih,
                                  targets, wo1, bo1, wo2, bo2, h0,
                                  interpret: bool = False,
                                  precision=None, leak: float = 1.0):
    """Elman analogue of ``decoder_loop_fused_losses`` (emission NLL +
    offset MLP/BCE fused in-kernel, (t == len-1) target synthesized from
    lengths, outs stream collapsed to a resident last-step block).
    ``noise`` is either the (T, B, F) presampled stream or the (1, 1)
    f32 seed (SEQ2SEQ_KERNEL_RNG).  Returns (out_last (B, H), nll
    covering positions 0..T-2, bce covering all positions).

    ``leak`` < 1.0 selects the ESN cell (model.py:444,529-531); pass
    bias = 0 (ESN has no biases)."""
    lengths_f = jnp.asarray(lengths, jnp.float32).reshape(-1, 1)
    return _rnn_floss_cvjp(
        noise, lengths_f, w_cat, bias.reshape(1, -1),
        b1_flat.reshape(1, -1), w2_mean, w2_logvar,
        b2_flat.reshape(1, -1), w_ih, targets, wo1, bo1, wo2, bo2, h0,
        interpret, precision, leak)


# ---------------------------------------------------------------------------
# Fused-loss LSTM variants: the training loss's only consumers of the
# emission streams are the masked Gaussian log-pdf and its adjoint, so
# in training the kernel can stream the TARGETS in and accumulate the
# negative log-likelihood in-kernel instead of streaming mean/logvar out
# and dmean/dlogvar back in.  Removes per step: 2 stream writes (fwd),
# 2 stream reads (bwd), the XLA loss forward + adjoint fusions over
# (T,B,F), and the two .at[-1].set overwrites on the host graph.
#
# with_offset=True additionally fuses the offset-predictor MLP and its
# masked BCE: the training offset target is exactly (t == len-1)
# (train/learner.py derives it from lengths on device), so the kernel
# synthesizes it in-register like the step masks — no target stream.
# The (T, B, H) outs stream then has NO consumer (offset logits were its
# only one) and collapses to a single resident last-step block, from
# which the caller recomputes position T-1's emission term.
# ---------------------------------------------------------------------------

_LOG_2PI = 1.8378770664093453
_TWO_PI = 6.283185307179586


def _kernel_noise(seed_ref, t, shape):
    """Standard-normal noise generated in-kernel (SEQ2SEQ_KERNEL_RNG=1):
    the per-core PRNG is re-seeded (seed, t) at each grid step, so the
    backward pass regenerates bit-identical draws and NO (T, B, F)
    noise stream ever exists in HBM — removing the XLA threefry fusion,
    its relayout copy, and the per-step stream reads in both kernels.
    Box-Muller over two 24-bit uniforms (u1 offset by 2^-25 so log(u1)
    is finite).  Hardware-only (interpret mode lacks prng_seed); like
    SEQ2SEQ_FAST_RNG this forks the RNG stream from the scan/stream
    paths, so same-seed CPU and TPU trajectories diverge — default off.
    """
    # the seed rides in SMEM as f32 (exact for values < 2^24) so the
    # custom VJP can return an ordinary zero cotangent for it instead
    # of float0
    pltpu.prng_seed(seed_ref[0, 0].astype(jnp.int32), t)

    def u24(bits):
        # logical shift in uint32, then via int32 (top byte now zero,
        # so the value is non-negative) — Mosaic has no uint32->f32
        # cast
        hi = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8,
                           jnp.int32)
        return hi.astype(jnp.float32) * (2.0 ** -24)

    u1 = u24(pltpu.prng_random_bits(shape)) + (2.0 ** -25)
    u2 = u24(pltpu.prng_random_bits(shape))
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def _noise_dump_kernel(seed_ref, out_ref):
    out_ref[0] = _kernel_noise(seed_ref, pl.program_id(0),
                               out_ref.shape[1:])


def decoder_noise_dump(seed, t, b, f, interpret: bool = False):
    """Materialize the exact (T, B, F) noise stream the kernel-RNG mode
    consumes — parity probes feed it to the stream-noise kernel path and
    compare (scripts/decoder_kernel_parity.py)."""
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _noise_dump_kernel,
        grid=(t,),
        in_specs=[smem],
        out_specs=pl.BlockSpec((1, b, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, f), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.float32).reshape(1, 1))


def _offset_target(t, len_ref, mt):
    """The training offset target y_t = 1 iff t == len-1, synthesized
    from the resident row-lengths block (mt = 1 iff t < len)."""
    tf = t.astype(jnp.float32)
    return mt - jnp.clip(len_ref[:, :] - tf - 1.0, 0.0, 1.0)


def _fused_fwd_kernel(*refs, hidden: int, m: int, with_offset: bool,
                      kernel_rng: bool = False, precision=None):
    """Like _fwd_kernel, but instead of emitting mean/logvar streams it
    reads the position-indexed TARGETS (same slot map: step t covers
    position t-1; the t=0 read of slot T-1 is dead — pmt masks it) and
    accumulates  sum_p mask_p * -log N(target_p; mean_p, var_p)  into an
    SMEM scalar.  Position T-1's term is added by the caller from the
    resident last-step block (the kernel never computes that position's
    emission).  with_offset additionally runs the offset MLP on h2 and
    accumulates the masked BCE into a second SMEM scalar."""
    if with_offset:
        (noise_ref, len_ref, wcat_ref, bias_ref, b1_ref, w2m_ref,
         w2v_ref, b2_ref, wih_ref, tgt_ref, wo1_ref, bo1_ref, wo2_ref,
         bo2_ref, h0_ref, c0_ref,
         out_ref, hs_ref, cs_ref, sc_ref, h_scr, c_scr) = refs
    else:
        (noise_ref, len_ref, wcat_ref, bias_ref, b1_ref, w2m_ref,
         w2v_ref, b2_ref, wih_ref, tgt_ref, h0_ref, c0_ref,
         out_ref, hs_ref, cs_ref, sc_ref, h_scr, c_scr) = refs
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:, :].astype(jnp.float32)
        c_scr[:] = c0_ref[:, :].astype(jnp.float32)
        sc_ref[0, 0] = 0.0
        if with_offset:
            sc_ref[0, 1] = 0.0

    h = h_scr[:]
    c = c_scr[:]
    mt, pmt = _step_masks(t, len_ref)
    big = _mxu_dot(h, wcat_ref[:, :], precision)
    hp = big[:, :4 * hidden]
    emh = jnp.tanh(big[:, 4 * hidden:] + b1_ref[:, :])
    f_dim = w2m_ref.shape[1]
    mean = (_mxu_dot(emh[:, :m], w2m_ref[:, :], precision)
            + b2_ref[:, :f_dim])
    logvar = (_mxu_dot(emh[:, m:], w2v_ref[:, :], precision)
              + b2_ref[:, f_dim:])
    if kernel_rng:
        # noise_ref is the (1,1) SMEM seed; generate slot max(t-1,0)'s
        # draw (the same slot the stream spec reads; dead at t=0)
        eps = _kernel_noise(noise_ref, jnp.maximum(t - 1, 0),
                            mean.shape)
    else:
        eps = noise_ref[0]
    x = mean + jnp.exp(0.5 * logvar) * eps
    x = x * pmt  # zero first input per row

    diff = tgt_ref[0] - mean
    nll_t = 0.5 * (_LOG_2PI + logvar + diff * jnp.exp(-logvar) * diff)
    sc_ref[0, 0] += jnp.sum(nll_t * pmt)

    gates = (hp + _mxu_dot(x, wih_ref[:, :], precision)
             + bias_ref[:, :])
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)

    if with_offset:
        oh = jnp.tanh(_mxu_dot(h2, wo1_ref[:, :], precision)
                      + bo1_ref[:, :])
        z = (jnp.sum(oh * wo2_ref[:, :], axis=1, keepdims=True)
             + bo2_ref[0, 0])
        y = _offset_target(t, len_ref, mt)
        bce = (jnp.maximum(z, 0.0) - z * y
               + jnp.log1p(jnp.exp(-jnp.abs(z))))
        sc_ref[0, 1] += jnp.sum(bce * mt)

    h = jnp.where(mt > 0, h2, h)
    c = jnp.where(mt > 0, c2, c)
    h_scr[:] = h
    c_scr[:] = c
    out_ref[0] = h2
    hs_ref[0] = h.astype(hs_ref.dtype)
    cs_ref[0] = c.astype(cs_ref.dtype)


def _fused_bwd_kernel(*refs, hidden: int, m: int, with_offset: bool,
                      kernel_rng: bool = False, precision=None):
    """Like _bwd_kernel, but the emission cotangents are computed
    in-kernel from the streamed targets (slot t-1) and the scalar loss
    cotangent g (SMEM):  d(-ll)/dmean = -g*pmt*diff*exp(-logvar),
    d(-ll)/dlogvar = g*pmt*0.5*(1 - diff^2*exp(-logvar)).  pmt is zero
    at t==0, so the parked-slot read needs no special-casing.
    with_offset replaces the douts stream with a resident last-step
    cotangent (applied at s == 0 only) and recomputes the offset MLP on
    h2 to derive its BCE cotangents in-register."""
    if with_offset:
        (noise_ref, len_ref, wcat_ref, bias_ref, b1_ref, w2m_ref,
         w2v_ref, b2_ref, wih_ref, tgt_ref, wo1_ref, bo1_ref, wo2_ref,
         bo2_ref, g_ref, hprev_ref, cprev_ref, h0_ref, c0_ref,
         dlast_ref,
         dwcat_ref, dbias_ref, db1_ref, dw2m_ref, dw2v_ref, db2_ref,
         dwih_ref, dwo1_ref, dbo1_ref, dwo2_ref, dbo2_ref,
         dh0_ref, dc0_ref, dh_scr, dc_scr) = refs
    else:
        (noise_ref, len_ref, wcat_ref, bias_ref, b1_ref, w2m_ref,
         w2v_ref, b2_ref, wih_ref, tgt_ref, g_ref,
         hprev_ref, cprev_ref, h0_ref, c0_ref, dout_ref,
         dwcat_ref, dbias_ref, db1_ref, dw2m_ref, dw2v_ref, db2_ref,
         dwih_ref, dh0_ref, dc0_ref, dh_scr, dc_scr) = refs
    s = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwcat_ref[:, :] = jnp.zeros_like(dwcat_ref)
        dbias_ref[:, :] = jnp.zeros_like(dbias_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        dw2m_ref[:, :] = jnp.zeros_like(dw2m_ref)
        dw2v_ref[:, :] = jnp.zeros_like(dw2v_ref)
        db2_ref[:, :] = jnp.zeros_like(db2_ref)
        dwih_ref[:, :] = jnp.zeros_like(dwih_ref)
        if with_offset:
            dwo1_ref[:, :] = jnp.zeros_like(dwo1_ref)
            dbo1_ref[:, :] = jnp.zeros_like(dbo1_ref)
            dwo2_ref[:, :] = jnp.zeros_like(dwo2_ref)
            dbo2_ref[0, 0] = 0.0

    first_step = s == nt - 1  # t == 0
    h_prev = jnp.where(first_step, h0_ref[:, :],
                       hprev_ref[0].astype(jnp.float32))
    c_prev = jnp.where(first_step, c0_ref[:, :],
                       cprev_ref[0].astype(jnp.float32))
    t_now = nt - 1 - s
    mt, pmt = _step_masks(t_now, len_ref)
    f_dim = w2m_ref.shape[1]
    if kernel_rng:
        eps = _kernel_noise(noise_ref, jnp.maximum(t_now - 1, 0),
                            (h0_ref.shape[0], f_dim))
    else:
        eps = noise_ref[0]

    # ---- forward recompute of this step
    big = _mxu_dot(h_prev, wcat_ref[:, :], precision)
    hp = big[:, :4 * hidden]
    emh = jnp.tanh(big[:, 4 * hidden:] + b1_ref[:, :])
    mean = (_mxu_dot(emh[:, :m], w2m_ref[:, :], precision)
            + b2_ref[:, :f_dim])
    logvar = (_mxu_dot(emh[:, m:], w2v_ref[:, :], precision)
              + b2_ref[:, f_dim:])
    std = jnp.exp(0.5 * logvar)
    x = (mean + std * eps) * pmt
    gates = (hp + _mxu_dot(x, wih_ref[:, :], precision)
             + bias_ref[:, :])
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    c2 = f * c_prev + i * g
    tanh_c2 = jnp.tanh(c2)

    # ---- adjoint
    dh_carry = dh_scr[:]
    dc_carry = dc_scr[:]
    if with_offset:
        # offset-MLP recompute on h2 + in-register BCE adjoint
        h2 = o * tanh_c2
        oh = jnp.tanh(_mxu_dot(h2, wo1_ref[:, :], precision)
                      + bo1_ref[:, :])
        z = (jnp.sum(oh * wo2_ref[:, :], axis=1, keepdims=True)
             + bo2_ref[0, 0])
        y = _offset_target(t_now, len_ref, mt)
        dz = g_ref[0, 1] * mt * (jax.nn.sigmoid(z) - y)
        doh = (dz * wo2_ref[:, :]) * (1.0 - oh * oh)
        dwo1_ref[:, :] += _mxu_dot_tn(h2, doh, precision)
        dbo1_ref[:, :] += jnp.sum(doh, axis=0, keepdims=True)
        dwo2_ref[:, :] += jnp.sum(oh * dz, axis=0, keepdims=True)
        dbo2_ref[0, 0] += jnp.sum(dz)
        dh2 = (_mxu_dot_nt(doh, wo1_ref[:, :], precision)
               + jnp.where(s == 0, dlast_ref[:, :], 0.0)
               + jnp.where(mt > 0, dh_carry, 0.0))
    else:
        dh2 = dout_ref[0] + jnp.where(mt > 0, dh_carry, 0.0)

    do = dh2 * tanh_c2
    dc2 = (jnp.where(mt > 0, dc_carry, 0.0)
           + dh2 * o * (1.0 - tanh_c2 * tanh_c2))
    df = dc2 * c_prev
    di = dc2 * g
    dg = dc2 * i
    dz = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f), dg * (1.0 - g * g),
         do * o * (1.0 - o)], axis=-1)

    dx = _mxu_dot_nt(dz, wih_ref[:, :], precision)
    dwih_ref[:, :] += _mxu_dot_tn(x, dz, precision)
    dbias_ref[:, :] += jnp.sum(dz, axis=0, keepdims=True)

    dx = dx * pmt
    # in-kernel emission-loss cotangents (replace the dmean/dlogvar
    # streams of _bwd_kernel)
    gscale = g_ref[0, 0]
    inv_var = jnp.exp(-logvar)
    diff = tgt_ref[0] - mean
    gm = gscale * pmt
    dmean = dx - gm * diff * inv_var
    dlogvar = (dx * 0.5 * std * eps
               + gm * 0.5 * (1.0 - diff * inv_var * diff))
    db2_ref[:, :f_dim] += jnp.sum(dmean, axis=0, keepdims=True)
    db2_ref[:, f_dim:] += jnp.sum(dlogvar, axis=0, keepdims=True)
    demh_m = _mxu_dot_nt(dmean, w2m_ref[:, :], precision)
    demh_v = _mxu_dot_nt(dlogvar, w2v_ref[:, :], precision)
    dw2m_ref[:, :] += _mxu_dot_tn(emh[:, :m], dmean, precision)
    dw2v_ref[:, :] += _mxu_dot_tn(emh[:, m:], dlogvar, precision)
    demh = jnp.concatenate([demh_m, demh_v], axis=-1)
    dbig_em = demh * (1.0 - emh * emh)
    db1_ref[:, :] += jnp.sum(dbig_em, axis=0, keepdims=True)

    dbig = jnp.concatenate([dz, dbig_em], axis=-1)
    dh_prev = (jnp.where(mt > 0, 0.0, dh_carry)
               + _mxu_dot_nt(dbig, wcat_ref[:, :], precision))
    dc_prev = jnp.where(mt > 0, 0.0, dc_carry) + dc2 * f
    dwcat_ref[:, :] += _mxu_dot_tn(h_prev, dbig, precision)
    dh_scr[:] = dh_prev
    dc_scr[:] = dc_prev

    @pl.when(s == nt - 1)
    def _():
        dh0_ref[:, :] = dh_scr[:]
        dc0_ref[:, :] = dc_scr[:]


def _fused_fwd_call(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih,
                    targets, offset_params, h0, c0, interpret,
                    precision):
    # noise is either the (T, B, F) f32 presampled stream or — in
    # kernel-RNG mode — the (1, 1) f32 seed scalar
    kernel_rng = noise.ndim == 2
    t, b, f = targets.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - 4 * hidden) // 2
    with_offset = offset_params is not None
    ins, stream3, res = _specs(t, b, f, hidden, m, g_all)
    pos = lambda shp: pl.BlockSpec(
        shp, lambda i: (jnp.where(i == 0, t - 1, i - 1), 0, 0),
        memory_space=pltpu.VMEM)
    smem = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.SMEM)
    n_sc = 2 if with_offset else 1
    if kernel_rng:
        ins = [smem((1, 1))] + ins[1:]
    in_specs = ins + [pos((1, b, f))]
    operands = [noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih,
                targets]
    if with_offset:
        wo1, bo1, wo2, bo2 = offset_params
        mo = wo1.shape[1]
        in_specs += [res((hidden, mo)), res((1, mo)), res((1, mo)),
                     smem((1, 1))]
        operands += [wo1, bo1, wo2, bo2]
        # outs collapses to a resident last-step block (every grid step
        # overwrites it; the final write is step T-1's pre-mask h2)
        out0 = res((1, b, hidden))
        out0_shape = jax.ShapeDtypeStruct((1, b, hidden), jnp.float32)
    else:
        out0 = stream3((1, b, hidden))
        out0_shape = jax.ShapeDtypeStruct((t, b, hidden), jnp.float32)
    in_specs += [res((b, hidden)), res((b, hidden))]
    operands += [h0, c0]
    outs, hs, cs, sc = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, hidden=hidden, m=m,
                          with_offset=with_offset, kernel_rng=kernel_rng,
                          precision=precision),
        grid=(t,),
        in_specs=in_specs,
        out_specs=[out0, stream3((1, b, hidden)),
                   stream3((1, b, hidden)), smem((1, n_sc))],
        out_shape=[out0_shape,
                   jax.ShapeDtypeStruct((t, b, hidden), _stream_dtype()),
                   jax.ShapeDtypeStruct((t, b, hidden), _stream_dtype()),
                   jax.ShapeDtypeStruct((1, n_sc), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32),
                        pltpu.VMEM((b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return outs, hs, cs, sc


def _fused_bwd_call(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih,
                    targets, offset_params, h0, c0, hs, cs, douts,
                    gscale, interpret, precision):
    """douts: the reversed (T,B,H) outs cotangent stream, or — with
    offset fusion — the resident (B,H) last-step cotangent.  gscale:
    (1,1) nll cotangent, or (1,2) [nll, bce] cotangents.  noise: the
    (T,B,F) presampled stream, or the (1,1) f32 seed (kernel RNG)."""
    kernel_rng = noise.ndim == 2
    t, b, f = targets.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - 4 * hidden) // 2
    with_offset = offset_params is not None
    ins, stream3, res = _specs(t, b, f, hidden, m, g_all)
    rev3 = lambda shp: pl.BlockSpec(shp, lambda i: (t - 1 - i, 0, 0),
                                    memory_space=pltpu.VMEM)
    shift3 = lambda shp: pl.BlockSpec(
        shp, lambda i: (jnp.maximum(t - 2 - i, 0), 0, 0),
        memory_space=pltpu.VMEM)
    smem = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.SMEM)
    rev_ins = [
        smem((1, 1)) if kernel_rng
        else shift3((1, b, f)),        # noise at t-1 / RNG seed
    ] + ins[1:] + [
        shift3((1, b, f)),             # targets at slot t-1 (pmt-gated)
    ]
    operands = [noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih,
                targets]
    if with_offset:
        wo1, bo1, wo2, bo2 = offset_params
        mo = wo1.shape[1]
        rev_ins += [res((hidden, mo)), res((1, mo)), res((1, mo)),
                    smem((1, 1))]
        operands += [wo1, bo1, wo2, bo2]
    rev_ins += [
        smem((1, 2 if with_offset else 1)),  # loss cotangent scalars
        shift3((1, b, hidden)),        # hs at t-1 -> h_prev
        shift3((1, b, hidden)),        # cs at t-1 -> c_prev
        res((b, hidden)),              # h0
        res((b, hidden)),              # c0
        res((b, hidden)) if with_offset
        else rev3((1, b, hidden)),     # dlast / dout stream
    ]
    operands += [gscale, hs, cs, h0, c0, douts]
    out_specs = [
        res((hidden, g_all)), res((1, 4 * hidden)), res((1, 2 * m)),
        res((m, f)), res((m, f)), res((1, 2 * f)), res((f, 4 * hidden)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(wcat.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, 4 * hidden), jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * m), jnp.float32),
        jax.ShapeDtypeStruct(w2m.shape, jnp.float32),
        jax.ShapeDtypeStruct(w2v.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * f), jnp.float32),
        jax.ShapeDtypeStruct(wih.shape, jnp.float32),
    ]
    if with_offset:
        mo = offset_params[0].shape[1]
        out_specs += [res((hidden, mo)), res((1, mo)), res((1, mo)),
                      smem((1, 1))]
        out_shape += [jax.ShapeDtypeStruct((hidden, mo), jnp.float32),
                      jax.ShapeDtypeStruct((1, mo), jnp.float32),
                      jax.ShapeDtypeStruct((1, mo), jnp.float32),
                      jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    out_specs += [res((b, hidden)), res((b, hidden))]
    out_shape += [jax.ShapeDtypeStruct((b, hidden), jnp.float32),
                  jax.ShapeDtypeStruct((b, hidden), jnp.float32)]
    grads = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, hidden=hidden, m=m,
                          with_offset=with_offset, kernel_rng=kernel_rng,
                          precision=precision),
        grid=(t,),
        in_specs=rev_ins,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32),
                        pltpu.VMEM((b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13))
def _fused_loop_cvjp(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                     wih, targets, h0, c0, interpret, precision):
    outs, hs, cs, sc = _fused_fwd_call(
        noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets,
        None, h0, c0, interpret, precision)
    return outs, sc.reshape(())


def _fused_loop_fwd(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                    wih, targets, h0, c0, interpret, precision):
    outs, hs, cs, sc = _fused_fwd_call(
        noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets,
        None, h0, c0, interpret, precision)
    return (outs, sc.reshape(())), (noise, lengths_f, wcat, bias, b1,
                                    w2m, w2v, b2, wih, targets, h0, c0,
                                    hs, cs)


def _fused_loop_bwd(interpret, precision, residuals, grads):
    (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets, h0,
     c0, hs, cs) = residuals
    douts, dnll = grads
    gscale = jnp.asarray(dnll, jnp.float32).reshape(1, 1)
    (dwcat, dbias, db1, dw2m, dw2v, db2, dwih, dh0,
     dc0) = _fused_bwd_call(noise, lengths_f, wcat, bias, b1, w2m, w2v,
                            b2, wih, targets, None, h0, c0, hs, cs,
                            douts, gscale, interpret, precision)
    return (jnp.zeros_like(noise), jnp.zeros_like(lengths_f),
            dwcat, dbias.reshape(-1), db1.reshape(-1), dw2m, dw2v,
            db2.reshape(-1), dwih, jnp.zeros_like(targets), dh0, dc0)


_fused_loop_cvjp.defvjp(_fused_loop_fwd, _fused_loop_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17))
def _floss_loop_cvjp(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                     wih, targets, wo1, bo1, wo2, bo2, h0, c0,
                     interpret, precision):
    out_last, hs, cs, sc = _fused_fwd_call(
        noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets,
        (wo1, bo1, wo2, bo2), h0, c0, interpret, precision)
    return out_last[0], sc[0, 0], sc[0, 1]


def _floss_loop_fwd(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                    wih, targets, wo1, bo1, wo2, bo2, h0, c0,
                    interpret, precision):
    out_last, hs, cs, sc = _fused_fwd_call(
        noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets,
        (wo1, bo1, wo2, bo2), h0, c0, interpret, precision)
    return ((out_last[0], sc[0, 0], sc[0, 1]),
            (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih,
             targets, wo1, bo1, wo2, bo2, h0, c0, hs, cs))


def _floss_loop_bwd(interpret, precision, residuals, grads):
    (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets,
     wo1, bo1, wo2, bo2, h0, c0, hs, cs) = residuals
    dlast, dnll, dbce = grads
    gscale = jnp.stack([jnp.asarray(dnll, jnp.float32),
                        jnp.asarray(dbce, jnp.float32)]).reshape(1, 2)
    (dwcat, dbias, db1, dw2m, dw2v, db2, dwih, dwo1, dbo1, dwo2, dbo2,
     dh0, dc0) = _fused_bwd_call(
        noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets,
        (wo1, bo1, wo2, bo2), h0, c0, hs, cs, dlast, gscale, interpret,
        precision)
    return (jnp.zeros_like(noise), jnp.zeros_like(lengths_f),
            dwcat, dbias.reshape(-1), db1.reshape(-1), dw2m, dw2v,
            db2.reshape(-1), dwih, jnp.zeros_like(targets),
            dwo1, dbo1, dwo2, dbo2, dh0, dc0)


_floss_loop_cvjp.defvjp(_floss_loop_fwd, _floss_loop_bwd)


def decoder_loop_fused_nll(noise, lengths, w_cat, bias, b1_flat,
                           w2_mean, w2_logvar, b2_flat, w_ih, targets,
                           h0, c0, interpret: bool = False,
                           precision=None):
    """LSTM decoder loop with the Gaussian emission NLL fused in-kernel.

    Training-only fast path: instead of emitting the (T, B, F)
    mean/logvar streams for an XLA-side masked log-pdf (whose adjoint
    then streams dmean/dlogvar back into the backward kernel), the
    kernel reads ``targets`` — the (T, B, F) position-major transpose of
    the padded ground truth — and accumulates

        nll = sum_{p=0}^{T-2} mask_p * -log N(target_p; mean_p, var_p)

    in an SMEM scalar.  Position T-1's term is NOT included (step 0's
    emission parks on that slot); the caller adds it from the final
    carry, exactly like the stream path's .at[-1].set overwrite.  The
    backward kernel computes the loss cotangents in-register from the
    same targets and the scalar upstream gradient.

    Returns (outs, nll): outs as in ``decoder_loop``; nll a f32 scalar.
    """
    lengths_f = jnp.asarray(lengths, jnp.float32).reshape(-1, 1)
    return _fused_loop_cvjp(
        noise, lengths_f, w_cat, bias.reshape(1, -1),
        b1_flat.reshape(1, -1), w2_mean, w2_logvar, b2_flat.reshape(1, -1),
        w_ih, targets, h0, c0, interpret, precision)


def decoder_loop_fused_losses(noise, lengths, w_cat, bias, b1_flat,
                              w2_mean, w2_logvar, b2_flat, w_ih, targets,
                              wo1, bo1, wo2, bo2, h0, c0,
                              interpret: bool = False, precision=None):
    """LSTM decoder loop with BOTH training losses fused in-kernel.

    Extends ``decoder_loop_fused_nll`` (Gaussian emission NLL from
    streamed position-major targets) with the offset-predictor MLP
    (Linear->tanh->Linear, models/mlp.py) and its masked BCE, whose
    target is synthesized in-register as (t == len-1) — the training
    contract (train/learner.py derives is_offset from lengths the same
    way; reference learning.py feeds the decoder the identical flag).
    With offset logits consumed in-kernel, the (T, B, H) outs stream has
    no consumer and collapses to one resident VMEM block holding the
    final step's pre-mask h2, from which the caller recomputes position
    T-1's emission term (the stream path's .at[-1].set overwrite).

    Args beyond decoder_loop_fused_nll: wo1 (H, Mo), bo1 (1, Mo),
    wo2 (1, Mo) — the offset MLP's second-layer weight as a row —
    and bo2 (1, 1).

    Returns (out_last (B, H), nll scalar, bce scalar): nll covers
    positions 0..T-2 (caller adds T-1's term), bce covers ALL T
    positions.
    """
    lengths_f = jnp.asarray(lengths, jnp.float32).reshape(-1, 1)
    return _floss_loop_cvjp(
        noise, lengths_f, w_cat, bias.reshape(1, -1),
        b1_flat.reshape(1, -1), w2_mean, w2_logvar, b2_flat.reshape(1, -1),
        w_ih, targets, wo1, bo1, wo2, bo2, h0, c0, interpret, precision)


def decoder_loop(noise, lengths, w_cat, bias, b1_flat,
                 w2_mean, w2_logvar, b2_flat, w_ih, h0, c0,
                 interpret: bool = False, precision=None):
    """Run the full autoregressive decoder time loop in one kernel.

    Args:
      noise: (T, B, F) presampled standard normals, UNSHIFTED (step t
        reads block max(t-1, 0) via the BlockSpec index map, so it
        consumes the noise that sampled position t-1's emission; the
        t=0 block content is dead because the in-kernel prev_mask
        zeroes each row's first active input).
      lengths: (B,) valid step counts.  Step and feedback masks are
        synthesized in-kernel from a resident (B, 1) float block
        (_step_masks) — nothing mask-shaped is streamed or assembled
        host/XLA-side.
      w_cat: (H, 4H + 2m) fused [recurrent | emission-lin1] weight.
      bias: (4H,) = b_ih + b_hh.
      b1_flat: (2m,) emission lin1 bias, [mean-branch | logvar-branch].
      w2_mean / w2_logvar: (m, F) emission lin2 weights.
      b2_flat: (2F,) = [b2_mean | b2_logvar].
      w_ih: (F, 4H) feedback input projection.
      h0, c0: (B, H) initial state.

    Returns (outs, mean_s, logvar_s):
      outs (T, B, H): the PRE-mask candidate hidden state h2 of each
        step — identical to the scan path's rnn_out (padded steps carry
        candidate values computed from the frozen carry; downstream
        losses mask them).
      mean_s / logvar_s (T, B, F): POSITION-indexed emission parameter
        streams — slot p holds the emission computed at step p+1 (of
        the masked carry after step p), equal to the scan path's
        position-p emission wherever mask_p=1.  Slot T-1 holds step 0's
        (dropped) pre-first-position emission; the caller overwrites it
        with the final position's emission (models/decoder.py).
    """
    lengths_f = jnp.asarray(lengths, jnp.float32).reshape(-1, 1)
    return _decoder_loop_cvjp(
        noise, lengths_f, w_cat, bias.reshape(1, -1),
        b1_flat.reshape(1, -1), w2_mean, w2_logvar, b2_flat.reshape(1, -1),
        w_ih, h0, c0, interpret, precision)

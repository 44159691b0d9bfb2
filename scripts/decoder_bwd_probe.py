"""Hardware probe: split decoder-loop backward (chain pass + weight pass).

BASELINE.md's round-4 lever hypothesis: the decoder-loop backward kernel
(7.44 ms at B=512 T=512, ~50% of its bf16-MXU roofline) is slow because
its sequential grid serializes the dh/dc adjoint chain with the
weight-gradient accumulation dots.  This probe implements the proposed
split for real and measures it against the production single-pass
kernel (ops/decoder_pallas.py:_bwd_call), same session, interleaved:

- pass1: reverse sequential grid, adjoint CHAIN only — recomputes the
  step, propagates dh/dc, streams per-step dz (B,4G), x (B,F), and the
  total demission cotangents dmean/dlogvar (B,F each); no weight
  accumulators.
- pass2: ascending grid, NO carried state — recomputes emh from the
  saved h trajectory (one (H,2m) dot), and accumulates every weight
  gradient from the streamed per-step quantities.  Steps are
  independent, so DMA double-buffering hides the streams.

Prints one JSON line per timed variant (median of --reps fetch-synced
wall times over a scan of --n chained calls) and a composition
correctness check (split vs single-pass grads, max abs diff).

Usage: python scripts/decoder_bwd_probe.py [--b 512] [--t 512] ...
"""

import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)

import numpy as np


def build_args(b, t, hidden, m, f, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    g_all = 4 * hidden + 2 * m

    def r(*shape, scale=0.05):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    noise = r(t, b, f, scale=1.0)
    lengths = np.full((b,), t, np.float32)
    lengths[: b // 4] = t // 2  # exercise the mask paths
    lengths_f = jnp.asarray(lengths)[:, None]
    wcat = r(hidden, g_all)
    bias = r(1, 4 * hidden)
    b1 = r(1, 2 * m)
    w2m = r(m, f)
    w2v = r(m, f)
    b2 = r(1, 2 * f)
    wih = r(f, 4 * hidden)
    h0 = r(b, hidden, scale=0.5)
    c0 = r(b, hidden, scale=0.5)
    hs = r(t, b, hidden, scale=0.5)
    cs = r(t, b, hidden, scale=0.5)
    douts = r(t, b, hidden, scale=1.0)
    dmean_s = r(t, b, f, scale=1.0)
    dlogvar_s = r(t, b, f, scale=1.0)
    return (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, h0, c0,
            hs, cs, douts, dmean_s, dlogvar_s)


# ---------------------------------------------------------------------------
# pass 1: adjoint chain only, streams per-step quantities
# ---------------------------------------------------------------------------

def _pass1_kernel(noise_ref, len_ref, wcat_ref, bias_ref,
                  b1_ref, w2m_ref, w2v_ref, b2_ref, wih_ref,
                  hprev_ref, cprev_ref, h0_ref, c0_ref, dout_ref,
                  dmean_ref, dlogvar_ref,
                  dh0_ref, dc0_ref, dz_ref, x_ref, dmt_ref, dlv_ref,
                  dh_scr, dc_scr,
                  *, hidden: int, m: int, precision=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from seq2seq_abcd_vae_tpu.ops.decoder_pallas import _step_masks
    from seq2seq_abcd_vae_tpu.ops.mxu import mxu_dot as _mxu_dot
    from seq2seq_abcd_vae_tpu.ops.mxu import mxu_dot_nt as _mxu_dot_nt

    s = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    first_step = s == nt - 1
    h_prev = jnp.where(first_step, h0_ref[:, :],
                       hprev_ref[0]).astype(jnp.float32)
    c_prev = jnp.where(first_step, c0_ref[:, :],
                       cprev_ref[0]).astype(jnp.float32)
    mt, pmt = _step_masks(nt - 1 - s, len_ref)
    eps = noise_ref[0]
    f_dim = w2m_ref.shape[1]

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

    dx = _mxu_dot_nt(dz, wih_ref[:, :], precision) * pmt
    dmean = dx + jnp.where(first_step, 0.0, dmean_ref[0])
    dlogvar = dx * 0.5 * std * eps + jnp.where(first_step, 0.0,
                                               dlogvar_ref[0])
    demh_m = _mxu_dot_nt(dmean, w2m_ref[:, :], precision)
    demh_v = _mxu_dot_nt(dlogvar, w2v_ref[:, :], precision)
    demh = jnp.concatenate([demh_m, demh_v], axis=-1)
    dbig_em = demh * (1.0 - emh * emh)
    dbig = jnp.concatenate([dz, dbig_em], axis=-1)
    dh_prev = (jnp.where(mt > 0, 0.0, dh_carry)
               + _mxu_dot_nt(dbig, wcat_ref[:, :], precision))
    dc_prev = jnp.where(mt > 0, 0.0, dc_carry) + dc2 * f
    dh_scr[:] = dh_prev
    dc_scr[:] = dc_prev

    dz_ref[0] = dz.astype(dz_ref.dtype)
    x_ref[0] = x.astype(x_ref.dtype)
    dmt_ref[0] = dmean.astype(dmt_ref.dtype)
    dlv_ref[0] = dlogvar.astype(dlv_ref.dtype)

    @pl.when(s == nt - 1)
    def _():
        dh0_ref[:, :] = dh_scr[:]
        dc0_ref[:, :] = dc_scr[:]


def pass1_call(args, interpret=False, precision="highest",
               stream_dtype=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from seq2seq_abcd_vae_tpu.ops.decoder_pallas import _specs

    (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, h0, c0,
     hs, cs, douts, dmean_s, dlogvar_s) = args
    t, b, f = noise.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - 4 * hidden) // 2
    sdt = stream_dtype or jnp.float32
    ins, stream3, res = _specs(t, b, f, hidden, m, g_all)
    rev3 = lambda shp: pl.BlockSpec(shp, lambda i: (t - 1 - i, 0, 0),
                                    memory_space=pltpu.VMEM)
    shift3 = lambda shp: pl.BlockSpec(
        shp, lambda i: (jnp.maximum(t - 2 - i, 0), 0, 0),
        memory_space=pltpu.VMEM)
    rev_ins = ([shift3((1, b, f))] + ins[1:]
               + [shift3((1, b, hidden)), shift3((1, b, hidden)),
                  res((b, hidden)), res((b, hidden)),
                  rev3((1, b, hidden)), shift3((1, b, f)),
                  shift3((1, b, f))])
    out_specs = [res((b, hidden)), res((b, hidden)),
                 rev3((1, b, 4 * hidden)), rev3((1, b, f)),
                 rev3((1, b, f)), rev3((1, b, f))]
    out_shape = [
        jax.ShapeDtypeStruct((b, hidden), jnp.float32),
        jax.ShapeDtypeStruct((b, hidden), jnp.float32),
        jax.ShapeDtypeStruct((t, b, 4 * hidden), sdt),
        jax.ShapeDtypeStruct((t, b, f), sdt),
        jax.ShapeDtypeStruct((t, b, f), sdt),
        jax.ShapeDtypeStruct((t, b, f), sdt),
    ]
    return pl.pallas_call(
        functools.partial(_pass1_kernel, hidden=hidden, m=m,
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


# ---------------------------------------------------------------------------
# pass 2: independent per-step weight-gradient accumulation
# ---------------------------------------------------------------------------

def _pass2_kernel(dz_ref, x_ref, dmt_ref, dlv_ref, hs_ref, h0_ref,
                  wcat_em_ref, b1_ref, w2m_ref, w2v_ref,
                  dwcat_ref, dbias_ref, db1_ref, dw2m_ref, dw2v_ref,
                  db2_ref, dwih_ref,
                  *, hidden: int, m: int, precision=None):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from seq2seq_abcd_vae_tpu.ops.mxu import mxu_dot as _mxu_dot
    from seq2seq_abcd_vae_tpu.ops.mxu import mxu_dot_nt as _mxu_dot_nt
    from seq2seq_abcd_vae_tpu.ops.mxu import mxu_dot_tn as _mxu_dot_tn

    t = pl.program_id(0)
    f_dim = w2m_ref.shape[1]

    @pl.when(t == 0)
    def _():
        dwcat_ref[:, :] = jnp.zeros_like(dwcat_ref)
        dbias_ref[:, :] = jnp.zeros_like(dbias_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        dw2m_ref[:, :] = jnp.zeros_like(dw2m_ref)
        dw2v_ref[:, :] = jnp.zeros_like(dw2v_ref)
        db2_ref[:, :] = jnp.zeros_like(db2_ref)
        dwih_ref[:, :] = jnp.zeros_like(dwih_ref)

    h_prev = jnp.where(t == 0, h0_ref[:, :],
                       hs_ref[0]).astype(jnp.float32)
    dz = dz_ref[0].astype(jnp.float32)
    x = x_ref[0].astype(jnp.float32)
    dmean = dmt_ref[0].astype(jnp.float32)
    dlogvar = dlv_ref[0].astype(jnp.float32)

    emh = jnp.tanh(_mxu_dot(h_prev, wcat_em_ref[:, :], precision)
                   + b1_ref[:, :])
    demh_m = _mxu_dot_nt(dmean, w2m_ref[:, :], precision)
    demh_v = _mxu_dot_nt(dlogvar, w2v_ref[:, :], precision)
    demh = jnp.concatenate([demh_m, demh_v], axis=-1)
    dbig_em = demh * (1.0 - emh * emh)
    dbig = jnp.concatenate([dz, dbig_em], axis=-1)

    dwih_ref[:, :] += _mxu_dot_tn(x, dz, precision)
    dbias_ref[:, :] += jnp.sum(dz, axis=0, keepdims=True)
    db2_ref[:, :f_dim] += jnp.sum(dmean, axis=0, keepdims=True)
    db2_ref[:, f_dim:] += jnp.sum(dlogvar, axis=0, keepdims=True)
    dw2m_ref[:, :] += _mxu_dot_tn(emh[:, :m], dmean, precision)
    dw2v_ref[:, :] += _mxu_dot_tn(emh[:, m:], dlogvar, precision)
    db1_ref[:, :] += jnp.sum(dbig_em, axis=0, keepdims=True)
    dwcat_ref[:, :] += _mxu_dot_tn(h_prev, dbig, precision)


def pass2_call(dz_s, x_s, dmt_s, dlv_s, hs, h0, wcat, b1, w2m, w2v,
               interpret=False, precision="highest"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, b, g4 = dz_s.shape
    hidden = h0.shape[1]
    m = b1.shape[1] // 2
    f = w2m.shape[1]
    g_all = wcat.shape[1]
    wcat_em = wcat[:, 4 * hidden:]
    stream3 = lambda shp: pl.BlockSpec(shp, lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
    shiftdown = lambda shp: pl.BlockSpec(
        shp, lambda i: (jnp.maximum(i - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    res = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                   memory_space=pltpu.VMEM)
    in_specs = [stream3((1, b, g4)), stream3((1, b, f)),
                stream3((1, b, f)), stream3((1, b, f)),
                shiftdown((1, b, hidden)), res((b, hidden)),
                res((hidden, 2 * m)), res((1, 2 * m)),
                res((m, f)), res((m, f))]
    out_specs = [res((hidden, g_all)), res((1, 4 * hidden)),
                 res((1, 2 * m)), res((m, f)), res((m, f)),
                 res((1, 2 * f)), res((f, 4 * hidden))]
    out_shape = [
        jax.ShapeDtypeStruct((hidden, g_all), jnp.float32),
        jax.ShapeDtypeStruct((1, 4 * hidden), jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * m), jnp.float32),
        jax.ShapeDtypeStruct((m, f), jnp.float32),
        jax.ShapeDtypeStruct((m, f), jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * f), jnp.float32),
        jax.ShapeDtypeStruct((f, 4 * hidden), jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_pass2_kernel, hidden=hidden, m=m,
                          precision=precision),
        grid=(t,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dz_s, x_s, dmt_s, dlv_s, hs, h0, wcat_em, b1, w2m, w2v)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--f", type=int, default=65)
    ap.add_argument("--n", type=int, default=8, help="chained calls per timing")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--precision", type=str, default="default")
    ap.add_argument("--stream_bf16", action="store_true",
                    help="pass1 streams dz/x/dmean/dlogvar in bf16")
    ap.add_argument("--cpu", action="store_true",
                    help="interpret-mode correctness only")
    args = ap.parse_args()

    if args.cpu:
        from seq2seq_abcd_vae_tpu.utils import platforms
        platforms.select_platforms("cpu")
    import jax
    import jax.numpy as jnp
    from seq2seq_abcd_vae_tpu.ops.decoder_pallas import _bwd_call
    from seq2seq_abcd_vae_tpu.utils.sync import wait

    interpret = jax.default_backend() != "tpu"
    precision = args.precision if args.precision != "default" else None
    sdt = jnp.bfloat16 if args.stream_bf16 else None
    kargs = build_args(args.b, args.t, args.hidden, args.m, args.f)
    kargs = jax.device_put(kargs)
    b, hidden = args.b, args.hidden

    def full_fn(a):
        (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, h0, c0,
         hs, cs, douts, dmean_s, dlogvar_s) = a
        return _bwd_call(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                         wih, h0, c0, hs, cs, douts, dmean_s, dlogvar_s,
                         interpret, precision)

    def pass1_fn(a):
        return pass1_call(a, interpret, precision, stream_dtype=sdt)

    def pass2_fn(a, p1):
        (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, h0, c0,
         hs, cs, douts, dmean_s, dlogvar_s) = a
        dh0, dc0, dz_s, x_s, dmt_s, dlv_s = p1
        return pass2_call(dz_s, x_s, dmt_s, dlv_s, hs, h0, wcat, b1,
                          w2m, w2v, interpret, precision)

    def split_fn(a):
        p1 = pass1_fn(a)
        p2 = pass2_fn(a, p1)
        return p1[:2] + tuple(p2)

    def pass2_xla(a, p1):
        """Pass 2 as flat XLA matmuls over the whole (T*B) streams —
        no Pallas grid; every dot is one big MXU-friendly contraction."""
        (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, h0, c0,
         hs, cs, douts, dmean_s, dlogvar_s) = a
        dh0, dc0, dz_s, x_s, dmt_s, dlv_s = p1
        t, bb, hh = hs.shape
        m_ = b1.shape[1] // 2
        pd = (jax.lax.Precision.HIGHEST if precision == "highest"
              else None)
        h_prev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
        hp = h_prev.reshape(t * bb, hh)
        dz = dz_s.reshape(t * bb, -1).astype(jnp.float32)
        x = x_s.reshape(t * bb, -1).astype(jnp.float32)
        dmt = dmt_s.reshape(t * bb, -1).astype(jnp.float32)
        dlv = dlv_s.reshape(t * bb, -1).astype(jnp.float32)
        emh = jnp.tanh(
            jnp.dot(hp, wcat[:, 4 * hidden:], precision=pd) + b1)
        demh = jnp.concatenate(
            [jnp.dot(dmt, w2m.T, precision=pd),
             jnp.dot(dlv, w2v.T, precision=pd)], axis=-1)
        dbig_em = demh * (1.0 - emh * emh)
        dbig = jnp.concatenate([dz, dbig_em], axis=-1)
        dwcat = jnp.dot(hp.T, dbig, precision=pd)
        dbias = jnp.sum(dz, axis=0, keepdims=True)
        db1 = jnp.sum(dbig_em, axis=0, keepdims=True)
        dw2m = jnp.dot(emh[:, :m_].T, dmt, precision=pd)
        dw2v = jnp.dot(emh[:, m_:].T, dlv, precision=pd)
        db2 = jnp.concatenate(
            [jnp.sum(dmt, axis=0, keepdims=True),
             jnp.sum(dlv, axis=0, keepdims=True)], axis=-1)
        dwih = jnp.dot(x.T, dz, precision=pd)
        return (dwcat, dbias, db1, dw2m, dw2v, db2, dwih)

    def split_xla_fn(a):
        p1 = pass1_fn(a)
        p2 = pass2_xla(a, p1)
        return p1[:2] + tuple(p2)

    # ---- correctness: split composition vs the production single pass
    ref = jax.jit(full_fn)(kargs)
    got = jax.jit(split_fn)(kargs)
    got_x = jax.jit(split_xla_fn)(kargs)
    ref_named = dict(zip(
        ["dwcat", "dbias", "db1", "dw2m", "dw2v", "db2", "dwih",
         "dh0", "dc0"], ref))
    got_named = {"dh0": got[0], "dc0": got[1],
                 "dwcat": got[2], "dbias": got[3], "db1": got[4],
                 "dw2m": got[5], "dw2v": got[6], "db2": got[7],
                 "dwih": got[8]}
    got_x_named = dict(got_named)
    got_x_named.update({"dwcat": got_x[2], "dbias": got_x[3],
                        "db1": got_x[4], "dw2m": got_x[5],
                        "dw2v": got_x[6], "db2": got_x[7],
                        "dwih": got_x[8]})
    for label, named in (("split_vs_full", got_named),
                         ("split_xla_vs_full", got_x_named)):
        diffs = {}
        ok = True
        for k, rv in ref_named.items():
            gv = named[k]
            d = float(jnp.max(jnp.abs(rv - gv)))
            rel = d / (float(jnp.max(jnp.abs(rv))) + 1e-12)
            diffs[k] = rel
            tol = 2e-2 if (sdt is not None or args.precision == "default") \
                else 1e-4
            ok = ok and rel <= tol
        print(json.dumps({"check": label, "ok": ok,
                          "max_rel_diffs": {k: f"{v:.2e}"
                                            for k, v in diffs.items()}}))
    if args.cpu:
        return

    # ---- timing: scan of n chained calls, perturbing h0 to serialize
    def timed(fn, extract):
        def run(a):
            def body(c, _):
                a2 = list(a)
                a2[9] = a[9] + c * 1e-30  # h0
                out = fn(tuple(a2))
                return extract(out), None
            c, _ = jax.lax.scan(body, jnp.zeros((b, hidden)), None,
                                length=args.n)
            return c
        return jax.jit(run)

    # extract must CONSUME the weight grads, not just dh0 — otherwise
    # XLA dead-code-eliminates pass2 inside the scan body (the first
    # probe run measured split == pass1 to the tenth of a ms).
    def dh0_and_weights(o, dh0_ix, dwcat_ix, dwih_ix):
        return (o[dh0_ix]
                + (jnp.sum(o[dwcat_ix]) + jnp.sum(o[dwih_ix])) * 1e-30)

    variants = {
        "full": timed(full_fn,
                      lambda o: dh0_and_weights(o, 7, 0, 6)),
        "pass1": timed(pass1_fn, lambda o: o[0]),           # chain only
        "split": timed(split_fn,
                       lambda o: dh0_and_weights(o, 0, 2, 8)),
        "split_xla": timed(split_xla_fn,
                           lambda o: dh0_and_weights(o, 0, 2, 8)),
    }
    # compile all first
    for name, fn in variants.items():
        t0 = time.perf_counter()
        wait(fn(kargs))
        print(json.dumps({"variant": name,
                          "compile_s": round(time.perf_counter() - t0, 1)}))
    times = {name: [] for name in variants}
    for _ in range(args.reps):
        for name, fn in variants.items():  # interleaved for drift fairness
            t0 = time.perf_counter()
            wait(fn(kargs))
            times[name].append((time.perf_counter() - t0) / args.n * 1e3)
    for name in variants:
        med = float(np.median(times[name]))
        print(json.dumps({"variant": name, "per_call_ms": round(med, 3),
                          "all_ms": [round(x, 2) for x in times[name]],
                          "n": args.n, "precision": args.precision,
                          "stream_bf16": bool(sdt)}))


if __name__ == "__main__":
    main()

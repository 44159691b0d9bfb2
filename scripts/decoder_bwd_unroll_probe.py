"""Hardware probe: grid-unrolled decoder-loop backward kernel.

The split-pass probe (scripts/decoder_bwd_probe.py) REFUTED the round-3
lever hypothesis: removing the weight-gradient dots from the sequential
chain saves only ~1.4 ms while re-reading the per-step streams in a
second pass costs ~2.4 ms (Pallas) or ~5.8 ms (flat XLA matmuls) — the
single-pass kernel's interleaved weight dots are cheaper than the HBM
round-trip they'd avoid.

This probe tests the other structural hypothesis: the chain retires at
~14.5 us/step against a ~7 us MXU floor, and the gap is per-grid-step
overhead (stream DMA semaphores x 6 input + stream outputs, VMEM
accumulator read-modify-writes, mask synthesis).  Processing UNROLL
steps per grid program amortizes all of it: blocks become
(UNROLL, B, .), the adjoint chains through registers between sub-steps,
and each weight accumulator is updated once per program instead of once
per step.

Requires T % unroll == 0 (publication T=512; production dispatch can
pad or fall back).

Usage: python scripts/decoder_bwd_unroll_probe.py [--unroll 2 4] ...
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

from decoder_bwd_probe import build_args  # noqa: E402 (same dir)


def _unrolled_bwd_kernel(noise_ref, len_ref, wcat_ref, bias_ref,
                         b1_ref, w2m_ref, w2v_ref, b2_ref, wih_ref,
                         hprev_ref, cprev_ref, h0_ref, c0_ref, dout_ref,
                         dmean_ref, dlogvar_ref,
                         dwcat_ref, dbias_ref, db1_ref, dw2m_ref,
                         dw2v_ref, db2_ref, dwih_ref, dh0_ref, dc0_ref,
                         dh_scr, dc_scr,
                         *, hidden: int, m: int, unroll: int,
                         precision=None):
    """Program s processes steps u_base+unroll-1 .. u_base (reverse),
    u_base = T - unroll*(s+1).  Block row j holds step u_base+j; the
    hprev/cprev/noise/dmean/dlogvar blocks are shifted one step down
    (row j holds step u_base+j-1's value, row 0 clamped)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from seq2seq_abcd_vae_tpu.ops.decoder_pallas import _step_masks
    from seq2seq_abcd_vae_tpu.ops.mxu import mxu_dot as _mxu_dot
    from seq2seq_abcd_vae_tpu.ops.mxu import mxu_dot_nt as _mxu_dot_nt
    from seq2seq_abcd_vae_tpu.ops.mxu import mxu_dot_tn as _mxu_dot_tn

    s = pl.program_id(0)
    ns = pl.num_programs(0)

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

    u_base = (ns - 1 - s) * unroll
    f_dim = w2m_ref.shape[1]
    dh_carry = dh_scr[:]
    dc_carry = dc_scr[:]
    acc = {k: None for k in
           ("dwcat", "dbias", "db1", "dw2m", "dw2v", "db2m", "db2v",
            "dwih")}

    def add(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v

    for j in range(unroll - 1, -1, -1):
        t_val = u_base + j
        first_step = t_val == 0
        h_prev = jnp.where(first_step, h0_ref[:, :],
                           hprev_ref[j]).astype(jnp.float32)
        c_prev = jnp.where(first_step, c0_ref[:, :],
                           cprev_ref[j]).astype(jnp.float32)
        mt, pmt = _step_masks(t_val, len_ref)
        eps = noise_ref[j]

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
        dh2 = dout_ref[j] + jnp.where(mt > 0, dh_carry, 0.0)
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
        add("dwih", _mxu_dot_tn(x, dz, precision))
        add("dbias", jnp.sum(dz, axis=0, keepdims=True))

        dx = dx * pmt
        dmean = dx + jnp.where(first_step, 0.0, dmean_ref[j])
        dlogvar = dx * 0.5 * std * eps + jnp.where(first_step, 0.0,
                                                   dlogvar_ref[j])
        add("db2m", jnp.sum(dmean, axis=0, keepdims=True))
        add("db2v", jnp.sum(dlogvar, axis=0, keepdims=True))
        demh_m = _mxu_dot_nt(dmean, w2m_ref[:, :], precision)
        demh_v = _mxu_dot_nt(dlogvar, w2v_ref[:, :], precision)
        add("dw2m", _mxu_dot_tn(emh[:, :m], dmean, precision))
        add("dw2v", _mxu_dot_tn(emh[:, m:], dlogvar, precision))
        demh = jnp.concatenate([demh_m, demh_v], axis=-1)
        dbig_em = demh * (1.0 - emh * emh)
        add("db1", jnp.sum(dbig_em, axis=0, keepdims=True))

        dbig = jnp.concatenate([dz, dbig_em], axis=-1)
        dh_carry = (jnp.where(mt > 0, 0.0, dh_carry)
                    + _mxu_dot_nt(dbig, wcat_ref[:, :], precision))
        dc_carry = jnp.where(mt > 0, 0.0, dc_carry) + dc2 * f
        add("dwcat", _mxu_dot_tn(h_prev, dbig, precision))

    dwcat_ref[:, :] += acc["dwcat"]
    dbias_ref[:, :] += acc["dbias"]
    db1_ref[:, :] += acc["db1"]
    dw2m_ref[:, :] += acc["dw2m"]
    dw2v_ref[:, :] += acc["dw2v"]
    db2_ref[:, :f_dim] += acc["db2m"]
    db2_ref[:, f_dim:] += acc["db2v"]
    dwih_ref[:, :] += acc["dwih"]
    dh_scr[:] = dh_carry
    dc_scr[:] = dc_carry

    @pl.when(s == ns - 1)
    def _():
        dh0_ref[:, :] = dh_scr[:]
        dc0_ref[:, :] = dc_scr[:]


def unrolled_bwd_call(args, unroll, interpret=False, precision=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, h0, c0,
     hs, cs, douts, dmean_s, dlogvar_s) = args
    t, b, f = noise.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - 4 * hidden) // 2
    assert t % unroll == 0, (t, unroll)
    ns = t // unroll
    res = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                   memory_space=pltpu.VMEM)
    # program s covers steps [u_base, u_base+unroll), u_base reversed
    rev = lambda shp: pl.BlockSpec(
        shp, lambda i: (ns - 1 - i, 0, 0), memory_space=pltpu.VMEM)
    # shifted-down-one blocks cross UNROLL boundaries, so they cannot be
    # block-aligned; stream them via elementwise index maps is not
    # expressible — instead pass PRE-SHIFTED host copies once (the probe
    # measures kernel rate; production would shift via a second
    # block-aligned stream and in-kernel row select).
    noise_sh = jnp.concatenate([noise[:1], noise[:-1]], axis=0)
    hs_sh = jnp.concatenate([hs[:1], hs[:-1]], axis=0)
    cs_sh = jnp.concatenate([cs[:1], cs[:-1]], axis=0)
    dmt_sh = jnp.concatenate([dmean_s[:1], dmean_s[:-1]], axis=0)
    dlv_sh = jnp.concatenate([dlogvar_s[:1], dlogvar_s[:-1]], axis=0)
    ins = [
        rev((unroll, b, f)),           # noise shifted
        res((b, 1)),                   # lengths
        res((hidden, g_all)),          # wcat
        res((1, 4 * hidden)),          # bias
        res((1, 2 * m)),               # b1
        res((m, f)),                   # w2 mean
        res((m, f)),                   # w2 logvar
        res((1, 2 * f)),               # b2
        res((f, 4 * hidden)),          # wih
        rev((unroll, b, hidden)),      # hs shifted -> h_prev rows
        rev((unroll, b, hidden)),      # cs shifted -> c_prev rows
        res((b, hidden)),              # h0
        res((b, hidden)),              # c0
        rev((unroll, b, hidden)),      # dout
        rev((unroll, b, f)),           # dmean shifted
        rev((unroll, b, f)),           # dlogvar shifted
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
    return pl.pallas_call(
        functools.partial(_unrolled_bwd_kernel, hidden=hidden, m=m,
                          unroll=unroll, precision=precision),
        grid=(ns,),
        in_specs=ins,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32),
                        pltpu.VMEM((b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(noise_sh, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih,
      hs_sh, cs_sh, h0, c0, douts, dmt_sh, dlv_sh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--f", type=int, default=65)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--unroll", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--precision", type=str, default="default")
    ap.add_argument("--cpu", action="store_true")
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
    kargs = build_args(args.b, args.t, args.hidden, args.m, args.f)
    kargs = jax.device_put(kargs)
    b, hidden = args.b, args.hidden

    def full_fn(a):
        (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, h0, c0,
         hs, cs, douts, dmean_s, dlogvar_s) = a
        return _bwd_call(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2,
                         wih, h0, c0, hs, cs, douts, dmean_s, dlogvar_s,
                         interpret, precision)

    names = ["dwcat", "dbias", "db1", "dw2m", "dw2v", "db2", "dwih",
             "dh0", "dc0"]
    ref = jax.jit(full_fn)(kargs)
    for u in args.unroll:
        got = jax.jit(lambda a, u=u: unrolled_bwd_call(
            a, u, interpret, precision))(kargs)
        diffs, ok = {}, True
        for k, rv, gv in zip(names, ref, got):
            d = float(jnp.max(jnp.abs(rv - gv)))
            rel = d / (float(jnp.max(jnp.abs(rv))) + 1e-12)
            diffs[k] = rel
            tol = 2e-2 if args.precision == "default" else 1e-4
            ok = ok and rel <= tol
        print(json.dumps({"check": f"unroll{u}_vs_full", "ok": ok,
                          "max_rel_diffs": {k: f"{v:.2e}"
                                            for k, v in diffs.items()}}))
    if args.cpu:
        return

    def timed(fn):
        def run(a):
            def body(c, _):
                a2 = list(a)
                a2[9] = a[9] + c * 1e-30  # h0
                out = fn(tuple(a2))
                # consume dh0 + weight grads so nothing is DCE'd
                return (out[7] + (jnp.sum(out[0]) + jnp.sum(out[6]))
                        * 1e-30), None
            c, _ = jax.lax.scan(body, jnp.zeros((b, hidden)), None,
                                length=args.n)
            return c
        return jax.jit(run)

    variants = {"full": timed(full_fn)}
    for u in args.unroll:
        variants[f"unroll{u}"] = timed(
            lambda a, u=u: unrolled_bwd_call(a, u, interpret, precision))
    for name, fn in variants.items():
        t0 = time.perf_counter()
        wait(fn(kargs))
        print(json.dumps({"variant": name,
                          "compile_s": round(time.perf_counter() - t0, 1)}))
    times = {name: [] for name in variants}
    for _ in range(args.reps):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            wait(fn(kargs))
            times[name].append((time.perf_counter() - t0) / args.n * 1e3)
    for name in variants:
        med = float(np.median(times[name]))
        print(json.dumps({"variant": name, "per_call_ms": round(med, 3),
                          "all_ms": [round(x, 2) for x in times[name]],
                          "n": args.n, "precision": args.precision}))


if __name__ == "__main__":
    main()

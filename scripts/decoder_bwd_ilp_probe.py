"""Hardware probe: batch-interleaved ILP in the decoder-loop kernels.

Round-3 refuted two restructurings of the decoder-loop backward
(7.5 ms at B=512 T=512, ~2x its bf16-MXU roofline): the split-pass
probe (decoder_bwd_probe.py) and the grid-unroll probe
(decoder_bwd_unroll_probe.py).  The remaining hypothesis — the round-4
lever in VERDICT.md — is that the bottleneck is the INTRA-step chain of
dependent small dots (dz -> dx -> dmean -> demh -> dbig -> dh_prev):
each dot waits on the previous one's result, so the MXU idles for the
pipeline latency between issues.

This probe splits the batch into NSPLIT independent sub-batches and
advances all of them inside the SAME grid step, stage-interleaved: the
sub-batches' chains are data-independent, so the Mosaic scheduler can
issue sub-batch B's dot while sub-batch A's result is still in the MXU
pipeline.  FLOP count is unchanged (each dot has B/NSPLIT rows); the
win, if any, is latency hiding.  Weight-gradient accumulators receive
the sum of per-half dots.

Target = the PRODUCTION training path: decoder_loop_fused_losses'
forward and backward kernels (ops/decoder_pallas.py:_fused_fwd_kernel /
_fused_bwd_kernel, with_offset=True — the 22.2 ms publication-shape
step's decoder component).

Prints one JSON line per check/variant; timing = interleaved
fetch-synced medians (utils/sync.wait; block_until_ready is a no-op on
this tunnel).

Usage: python scripts/decoder_bwd_ilp_probe.py [--b 512] [--t 512]
       [--nsplit 2 4] [--cpu]
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


def build_floss_args(b, t, hidden, m, f, mo, seed=0):
    """Random operands for the fused-losses kernels (with_offset)."""
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
    targets = r(t, b, f, scale=1.0)
    wo1 = r(hidden, mo)
    bo1 = r(1, mo)
    wo2 = r(1, mo)
    bo2 = r(1, 1)
    h0 = r(b, hidden, scale=0.5)
    c0 = r(b, hidden, scale=0.5)
    hs = r(t, b, hidden, scale=0.5)
    cs = r(t, b, hidden, scale=0.5)
    dlast = r(b, hidden, scale=1.0)
    gscale = jnp.asarray([[1.0, 1.0]], jnp.float32)
    return (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets,
            wo1, bo1, wo2, bo2, h0, c0, hs, cs, dlast, gscale)


# ---------------------------------------------------------------------------
# batch-interleaved fused-losses BACKWARD kernel (with_offset)
# ---------------------------------------------------------------------------

def _ilp_fused_bwd_kernel(noise_ref, len_ref, wcat_ref, bias_ref, b1_ref,
                          w2m_ref, w2v_ref, b2_ref, wih_ref, tgt_ref,
                          wo1_ref, bo1_ref, wo2_ref, bo2_ref, g_ref,
                          hprev_ref, cprev_ref, h0_ref, c0_ref,
                          dlast_ref,
                          dwcat_ref, dbias_ref, db1_ref, dw2m_ref,
                          dw2v_ref, db2_ref, dwih_ref, dwo1_ref,
                          dbo1_ref, dwo2_ref, dbo2_ref,
                          dh0_ref, dc0_ref, dh_scr, dc_scr,
                          *, hidden: int, m: int, nsplit: int,
                          precision=None):
    """_fused_bwd_kernel (with_offset) with the batch split into
    ``nsplit`` independent sub-batches whose dependent-dot chains are
    stage-interleaved: every dot in the adjoint chain is issued for all
    sub-batches before the next chain stage consumes any result, giving
    the scheduler nsplit independent in-flight chains."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from seq2seq_abcd_vae_tpu.ops.decoder_pallas import (_offset_target,
                                                         _step_masks)
    from seq2seq_abcd_vae_tpu.ops.mxu import mxu_dot as _dot
    from seq2seq_abcd_vae_tpu.ops.mxu import mxu_dot_nt as _dot_nt
    from seq2seq_abcd_vae_tpu.ops.mxu import mxu_dot_tn as _dot_tn

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
        dwo1_ref[:, :] = jnp.zeros_like(dwo1_ref)
        dbo1_ref[:, :] = jnp.zeros_like(dbo1_ref)
        dwo2_ref[:, :] = jnp.zeros_like(dwo2_ref)
        dbo2_ref[0, 0] = 0.0

    bfull = h0_ref.shape[0]
    bs = bfull // nsplit
    first_step = s == nt - 1  # t == 0
    t_now = nt - 1 - s
    f_dim = w2m_ref.shape[1]

    # full-block loads once; per-half views are static slices
    h_prev_full = jnp.where(first_step, h0_ref[:, :],
                            hprev_ref[0]).astype(jnp.float32)
    c_prev_full = jnp.where(first_step, c0_ref[:, :],
                            cprev_ref[0]).astype(jnp.float32)
    mt_full, pmt_full = _step_masks(t_now, len_ref)
    y_full = _offset_target(t_now, len_ref, mt_full)
    eps_full = noise_ref[0]
    tgt_full = tgt_ref[0]
    dh_carry_full = dh_scr[:]
    dc_carry_full = dc_scr[:]
    dlast_full = dlast_ref[:, :]
    gscale = g_ref[0, 0]
    gbce = g_ref[0, 1]

    K = range(nsplit)
    rows = [slice(k * bs, (k + 1) * bs) for k in K]
    h_prev = [h_prev_full[r] for r in rows]
    c_prev = [c_prev_full[r] for r in rows]
    mt = [mt_full[r] for r in rows]
    pmt = [pmt_full[r] for r in rows]
    y = [y_full[r] for r in rows]
    eps = [eps_full[r] for r in rows]
    tgt = [tgt_full[r] for r in rows]
    dh_carry = [dh_carry_full[r] for r in rows]
    dc_carry = [dc_carry_full[r] for r in rows]
    dlast = [dlast_full[r] for r in rows]

    # ---- forward recompute, stage-interleaved across sub-batches
    big = [_dot(h_prev[k], wcat_ref[:, :], precision) for k in K]
    hp = [big[k][:, :4 * hidden] for k in K]
    emh = [jnp.tanh(big[k][:, 4 * hidden:] + b1_ref[:, :]) for k in K]
    mean = [_dot(emh[k][:, :m], w2m_ref[:, :], precision)
            + b2_ref[:, :f_dim] for k in K]
    logvar = [_dot(emh[k][:, m:], w2v_ref[:, :], precision)
              + b2_ref[:, f_dim:] for k in K]
    std = [jnp.exp(0.5 * logvar[k]) for k in K]
    x = [(mean[k] + std[k] * eps[k]) * pmt[k] for k in K]
    gates = [hp[k] + _dot(x[k], wih_ref[:, :], precision)
             + bias_ref[:, :] for k in K]
    i_ = [jax.nn.sigmoid(gates[k][:, :hidden]) for k in K]
    f_ = [jax.nn.sigmoid(gates[k][:, hidden:2 * hidden]) for k in K]
    g_ = [jnp.tanh(gates[k][:, 2 * hidden:3 * hidden]) for k in K]
    o_ = [jax.nn.sigmoid(gates[k][:, 3 * hidden:]) for k in K]
    c2 = [f_[k] * c_prev[k] + i_[k] * g_[k] for k in K]
    tanh_c2 = [jnp.tanh(c2[k]) for k in K]

    # ---- offset-MLP recompute + BCE adjoint
    h2 = [o_[k] * tanh_c2[k] for k in K]
    oh = [jnp.tanh(_dot(h2[k], wo1_ref[:, :], precision) + bo1_ref[:, :])
          for k in K]
    z = [jnp.sum(oh[k] * wo2_ref[:, :], axis=1, keepdims=True)
         + bo2_ref[0, 0] for k in K]
    dzo = [gbce * mt[k] * (jax.nn.sigmoid(z[k]) - y[k]) for k in K]
    doh = [(dzo[k] * wo2_ref[:, :]) * (1.0 - oh[k] * oh[k]) for k in K]
    dwo1_acc = [_dot_tn(h2[k], doh[k], precision) for k in K]
    dwo1_ref[:, :] += sum(dwo1_acc)
    dbo1_ref[:, :] += sum(jnp.sum(doh[k], axis=0, keepdims=True)
                          for k in K)
    dwo2_ref[:, :] += sum(jnp.sum(oh[k] * dzo[k], axis=0, keepdims=True)
                          for k in K)
    dbo2_ref[0, 0] += sum(jnp.sum(dzo[k]) for k in K)
    dh2_off = [_dot_nt(doh[k], wo1_ref[:, :], precision) for k in K]
    dh2 = [dh2_off[k] + jnp.where(s == 0, dlast[k], 0.0)
           + jnp.where(mt[k] > 0, dh_carry[k], 0.0) for k in K]

    # ---- LSTM-cell adjoint (VPU)
    do = [dh2[k] * tanh_c2[k] for k in K]
    dc2 = [jnp.where(mt[k] > 0, dc_carry[k], 0.0)
           + dh2[k] * o_[k] * (1.0 - tanh_c2[k] * tanh_c2[k]) for k in K]
    df = [dc2[k] * c_prev[k] for k in K]
    di = [dc2[k] * g_[k] for k in K]
    dg = [dc2[k] * i_[k] for k in K]
    dz = [jnp.concatenate(
        [di[k] * i_[k] * (1.0 - i_[k]), df[k] * f_[k] * (1.0 - f_[k]),
         dg[k] * (1.0 - g_[k] * g_[k]), do[k] * o_[k] * (1.0 - o_[k])],
        axis=-1) for k in K]

    # ---- the dependent-dot chain, interleaved per stage
    dx = [_dot_nt(dz[k], wih_ref[:, :], precision) for k in K]
    dwih_ref[:, :] += sum(_dot_tn(x[k], dz[k], precision) for k in K)
    dbias_ref[:, :] += sum(jnp.sum(dz[k], axis=0, keepdims=True)
                           for k in K)
    dx = [dx[k] * pmt[k] for k in K]
    inv_var = [jnp.exp(-logvar[k]) for k in K]
    diff = [tgt[k] - mean[k] for k in K]
    gm = [gscale * pmt[k] for k in K]
    dmean = [dx[k] - gm[k] * diff[k] * inv_var[k] for k in K]
    dlogvar = [dx[k] * 0.5 * std[k] * eps[k]
               + gm[k] * 0.5 * (1.0 - diff[k] * inv_var[k] * diff[k])
               for k in K]
    db2_ref[:, :f_dim] += sum(jnp.sum(dmean[k], axis=0, keepdims=True)
                              for k in K)
    db2_ref[:, f_dim:] += sum(jnp.sum(dlogvar[k], axis=0, keepdims=True)
                              for k in K)
    demh_m = [_dot_nt(dmean[k], w2m_ref[:, :], precision) for k in K]
    demh_v = [_dot_nt(dlogvar[k], w2v_ref[:, :], precision) for k in K]
    dw2m_ref[:, :] += sum(_dot_tn(emh[k][:, :m], dmean[k], precision)
                          for k in K)
    dw2v_ref[:, :] += sum(_dot_tn(emh[k][:, m:], dlogvar[k], precision)
                          for k in K)
    demh = [jnp.concatenate([demh_m[k], demh_v[k]], axis=-1) for k in K]
    dbig_em = [demh[k] * (1.0 - emh[k] * emh[k]) for k in K]
    db1_ref[:, :] += sum(jnp.sum(dbig_em[k], axis=0, keepdims=True)
                         for k in K)
    dbig = [jnp.concatenate([dz[k], dbig_em[k]], axis=-1) for k in K]
    dh_prev = [jnp.where(mt[k] > 0, 0.0, dh_carry[k])
               + _dot_nt(dbig[k], wcat_ref[:, :], precision) for k in K]
    dc_prev = [jnp.where(mt[k] > 0, 0.0, dc_carry[k]) + dc2[k] * f_[k]
               for k in K]
    dwcat_ref[:, :] += sum(_dot_tn(h_prev[k], dbig[k], precision)
                           for k in K)
    dh_scr[:] = jnp.concatenate(dh_prev, axis=0)
    dc_scr[:] = jnp.concatenate(dc_prev, axis=0)

    @pl.when(s == nt - 1)
    def _():
        dh0_ref[:, :] = dh_scr[:]
        dc0_ref[:, :] = dc_scr[:]


def ilp_bwd_call(a, nsplit, interpret, precision):
    """Mirror of _fused_bwd_call (with_offset, stream noise) dispatching
    the batch-interleaved kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from seq2seq_abcd_vae_tpu.ops.decoder_pallas import _specs

    (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets,
     wo1, bo1, wo2, bo2, h0, c0, hs, cs, dlast, gscale) = a
    t, b, f = targets.shape
    hidden = h0.shape[1]
    g_all = wcat.shape[1]
    m = (g_all - 4 * hidden) // 2
    mo = wo1.shape[1]
    ins, stream3, res = _specs(t, b, f, hidden, m, g_all)
    shift3 = lambda shp: pl.BlockSpec(
        shp, lambda i: (jnp.maximum(t - 2 - i, 0), 0, 0),
        memory_space=pltpu.VMEM)
    smem = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.SMEM)
    rev_ins = ([shift3((1, b, f))] + ins[1:] + [shift3((1, b, f))]
               + [res((hidden, mo)), res((1, mo)), res((1, mo)),
                  smem((1, 1)), smem((1, 2)),
                  shift3((1, b, hidden)), shift3((1, b, hidden)),
                  res((b, hidden)), res((b, hidden)), res((b, hidden))])
    out_specs = [
        res((hidden, g_all)), res((1, 4 * hidden)), res((1, 2 * m)),
        res((m, f)), res((m, f)), res((1, 2 * f)), res((f, 4 * hidden)),
        res((hidden, mo)), res((1, mo)), res((1, mo)), smem((1, 1)),
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
        jax.ShapeDtypeStruct((hidden, mo), jnp.float32),
        jax.ShapeDtypeStruct((1, mo), jnp.float32),
        jax.ShapeDtypeStruct((1, mo), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, hidden), jnp.float32),
        jax.ShapeDtypeStruct((b, hidden), jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_ilp_fused_bwd_kernel, hidden=hidden, m=m,
                          nsplit=nsplit, precision=precision),
        grid=(t,),
        in_specs=rev_ins,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32),
                        pltpu.VMEM((b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets,
      wo1, bo1, wo2, bo2, gscale, hs, cs, h0, c0, dlast)


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
    ap.add_argument("--mo", type=int, default=256)
    ap.add_argument("--nsplit", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--n", type=int, default=8,
                    help="chained calls per timing")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--precision", type=str, default="default")
    ap.add_argument("--cpu", action="store_true",
                    help="interpret-mode correctness only")
    args = ap.parse_args()

    if args.cpu:
        from seq2seq_abcd_vae_tpu.utils import platforms
        platforms.select_platforms("cpu")
    import jax
    import jax.numpy as jnp
    from seq2seq_abcd_vae_tpu.ops.decoder_pallas import _fused_bwd_call
    from seq2seq_abcd_vae_tpu.utils.sync import wait

    interpret = jax.default_backend() != "tpu"
    precision = args.precision if args.precision != "default" else None
    kargs = build_floss_args(args.b, args.t, args.hidden, args.m, args.f,
                             args.mo)
    kargs = jax.device_put(kargs)
    b, hidden = args.b, args.hidden

    def full_fn(a):
        (noise, lengths_f, wcat, bias, b1, w2m, w2v, b2, wih, targets,
         wo1, bo1, wo2, bo2, h0, c0, hs, cs, dlast, gscale) = a
        return _fused_bwd_call(noise, lengths_f, wcat, bias, b1, w2m,
                               w2v, b2, wih, targets,
                               (wo1, bo1, wo2, bo2), h0, c0, hs, cs,
                               dlast, gscale, interpret, precision)

    names = ["dwcat", "dbias", "db1", "dw2m", "dw2v", "db2", "dwih",
             "dwo1", "dbo1", "dwo2", "dbo2", "dh0", "dc0"]

    # ---- correctness vs the production single-chain kernel
    ref = jax.jit(full_fn)(kargs)
    variants = {"full": full_fn}
    for ns in args.nsplit:
        got = jax.jit(functools.partial(
            ilp_bwd_call, nsplit=ns, interpret=interpret,
            precision=precision))(kargs)
        diffs = {}
        ok = True
        for k, rv, gv in zip(names, ref, got):
            d = float(jnp.max(jnp.abs(rv - gv)))
            rel = d / (float(jnp.max(jnp.abs(rv))) + 1e-12)
            diffs[k] = rel
            tol = 2e-2 if args.precision == "default" else 1e-4
            ok = ok and rel <= tol
        print(json.dumps({"check": f"ilp{ns}_vs_full", "ok": ok,
                          "max_rel_diffs": {k: f"{v:.2e}"
                                            for k, v in diffs.items()}}),
              flush=True)
        variants[f"ilp{ns}"] = functools.partial(
            ilp_bwd_call, nsplit=ns, interpret=interpret,
            precision=precision)
    if args.cpu:
        return

    # ---- timing: scan of n chained calls, perturbing h0 to serialize
    def timed(fn, dh0_ix):
        def run(a):
            def body(c, _):
                a2 = list(a)
                a2[14] = a[14] + c * 1e-30  # h0
                out = fn(tuple(a2))
                return (out[dh0_ix]
                        + (jnp.sum(out[0]) + jnp.sum(out[6])) * 1e-30), None
            c, _ = jax.lax.scan(body, jnp.zeros((b, hidden)), None,
                                length=args.n)
            return c
        return jax.jit(run)

    timed_variants = {name: timed(fn, 11 if name != "full" else 11)
                      for name, fn in variants.items()}
    for name, fn in timed_variants.items():
        t0 = time.perf_counter()
        wait(fn(kargs))
        print(json.dumps({"variant": name,
                          "compile_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    times = {name: [] for name in timed_variants}
    for _ in range(args.reps):
        for name, fn in timed_variants.items():  # interleaved for drift
            t0 = time.perf_counter()
            wait(fn(kargs))
            times[name].append((time.perf_counter() - t0) / args.n * 1e3)
    for name in timed_variants:
        med = float(np.median(times[name]))
        print(json.dumps({"variant": name, "per_call_ms": round(med, 3),
                          "all_ms": [round(x, 2) for x in times[name]],
                          "n": args.n, "precision": args.precision}),
              flush=True)


if __name__ == "__main__":
    main()

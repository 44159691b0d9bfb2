"""On-hardware gradient-parity probe: Pallas layer kernels vs lax.scan.

The Pallas kernels are unit-tested in interpret mode (CPU); this probe
runs the REAL compiled kernels on the attached TPU and compares layer
outputs, final states, and parameter/input gradients against the scan
path.  A silent mismatch here would corrupt training whenever the
backend auto-selection (utils/backend_select.py) picks 'pallas'.

Covers all six encoder layer-kernel configurations: LSTM, GRU, and
Elman RNN (reference's trainable -R choices,
ABCD-VAE/modules/model.py:53), unidirectional (lstm_layer / gru_layer /
elman_pallas.rnn_layer) and fully fused bidirectional
(*_layer_bidir_fused).  Prints one JSON line per configuration with
max-abs diffs and a pass flag, then a summary line.

Usage: python scripts/pallas_grad_parity.py [B] [T] [H] [IN]
Env: SEQ2SEQ_KERNEL_MXU=bf16 probes the one-pass-bf16 MXU mode
(tolerances widen automatically; see ops/mxu.py).
"""

import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)

import numpy as np

NUM_GATES = {"LSTM": 4, "GRU": 3, "RNN": 1}


def _force_backend(backend):
    os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
    os.environ["SEQ2SEQ_ENCODER_BACKEND"] = backend
    from seq2seq_abcd_vae_tpu.utils import backend_select
    backend_select.resolve_rnn_backend.cache_clear()


def probe(rnn_type, bidir, b, t, h, f):
    import jax
    import jax.numpy as jnp

    from seq2seq_abcd_vae_tpu.models import initializers as init
    from seq2seq_abcd_vae_tpu.models import rnn as rnn_mod

    rng = np.random.default_rng(0)
    gates = NUM_GATES[rnn_type]
    p_f = init.rnn_gate_params(jax.random.PRNGKey(0), f, h, gates)
    p_b = init.rnn_gate_params(jax.random.PRNGKey(1), f, h, gates)
    x = jnp.asarray(rng.normal(size=(b, t, f)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, t + 1, size=(b,)))
    lengths = lengths.at[0].set(t)
    mask = jnp.arange(t)[None, :] < lengths[:, None]

    if bidir:
        def fwd(p_f, p_b, x):
            of, ob, fin = rnn_mod.run_rnn_layer_bidir(rnn_type, p_f, p_b,
                                                      x, mask)
            (hf, cf), (hb, cb) = fin
            loss = (jnp.sum(of * of) * 1e-3 + jnp.sum(ob * ob) * 1e-3
                    + jnp.sum(hf) + jnp.sum(hb)
                    + jnp.sum(jnp.tanh(cf + cb)))
            return loss, (of + ob, hf + hb, cf + cb)

        def run(backend):
            _force_backend(backend)
            vg = jax.value_and_grad(
                lambda pf, pb, xx: fwd(pf, pb, xx)[0], argnums=(0, 1, 2))
            loss, (gpf, gpb, gx) = jax.jit(vg)(p_f, p_b, x)
            _, (outs, h_n, c_n) = fwd(p_f, p_b, x)
            gp = {k: np.asarray(v) for k, v in gpf.items()}
            gp.update({k + "_rev": np.asarray(v) for k, v in gpb.items()})
            return dict(loss=float(loss), outs=np.asarray(outs),
                        h=np.asarray(h_n), c=np.asarray(c_n),
                        gx=np.asarray(gx), gp=gp)
    else:
        def fwd(p, x):
            outs, (h_n, c_n) = rnn_mod.run_rnn_layer(rnn_type, p, x, mask)
            loss = (jnp.sum(outs * outs) * 1e-3 + jnp.sum(h_n)
                    + jnp.sum(jnp.tanh(c_n)))
            return loss, (outs, h_n, c_n)

        def run(backend):
            _force_backend(backend)
            vg = jax.value_and_grad(lambda p, xx: fwd(p, xx)[0],
                                    argnums=(0, 1))
            loss, (gp, gx) = jax.jit(vg)(p_f, x)
            _, (outs, h_n, c_n) = fwd(p_f, x)
            return dict(loss=float(loss), outs=np.asarray(outs),
                        h=np.asarray(h_n), c=np.asarray(c_n),
                        gx=np.asarray(gx),
                        gp={k: np.asarray(v) for k, v in gp.items()})

    s, p = run("scan"), run("pallas")
    diffs = {
        "loss": abs(s["loss"] - p["loss"]) / (abs(s["loss"]) + 1e-9),
        "outs": float(np.max(np.abs(s["outs"] - p["outs"]))),
        "h": float(np.max(np.abs(s["h"] - p["h"]))),
        "c": float(np.max(np.abs(s["c"] - p["c"]))),
        "grad_x": float(np.max(np.abs(s["gx"] - p["gx"]))),
    }
    for k in s["gp"]:
        diffs["grad_" + k] = float(np.max(np.abs(s["gp"][k] - p["gp"][k])))
    # bf16 MXU mode trades ~1e-2-scale rounding for one-pass issue;
    # f32 accumulation keeps grads finite and small-biased (BASELINE.md)
    wide = os.environ.get("SEQ2SEQ_KERNEL_MXU") == "bf16"
    tol_out, tol_grad = (3e-2, 1e-1) if wide else (1e-3, 2e-2)
    scale = float(np.max(np.abs(s["gx"]))) + 1e-9
    ok = (diffs["outs"] < tol_out and diffs["h"] < tol_out
          and diffs["grad_x"] < max(tol_out, tol_out * scale)
          and all(v < tol_grad for k, v in diffs.items()
                  if k.startswith("grad_")))
    import jax
    return {"config": f"{rnn_type}{'-bidir' if bidir else ''}",
            "shape": [b, t, h, f], "pass": bool(ok),
            "platform": jax.devices()[0].platform,
            "max_abs_diffs": {k: round(v, 8) for k, v in diffs.items()}}


def probe_esn(bidir, b, t, h, f, leak=0.7):
    """ESN encoder layers: the Elman kernels generalized with a static
    leak and zero biases (reference model.py:444,529-531).  Reservoir
    weights are frozen (stop_gradient) so parity is outputs + final
    states + INPUT gradients (a lower layer's trainable output for
    stacked ESNs) and exact-zero weight grads on both paths."""
    import jax
    import jax.numpy as jnp

    from seq2seq_abcd_vae_tpu.models import esn as esn_mod

    os.environ["SEQ2SEQ_ESN_KERNELS"] = "1"
    rng = np.random.default_rng(5)
    p_f = esn_mod.esn_layer_init(jax.random.PRNGKey(0), f, h)
    p_b = esn_mod.esn_layer_init(jax.random.PRNGKey(1), f, h)
    x = jnp.asarray(rng.normal(size=(b, t, f)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, t + 1, size=(b,)))
    lengths = lengths.at[0].set(t)
    mask = jnp.arange(t)[None, :] < lengths[:, None]

    if bidir:
        def fwd(x):
            of, ob, hf, hb = esn_mod.run_esn_layer_bidir(
                p_f, p_b, x, mask, leak)
            loss = (jnp.sum(of * jnp.tanh(ob)) * 1e-2
                    + jnp.sum(hf * hb))
            return loss, (of + ob, hf + hb)
    else:
        def fwd(x):
            outs, h_n = esn_mod.run_esn_layer(p_f, x, mask, leak)
            loss = jnp.sum(outs * jnp.tanh(outs)) * 1e-2 + jnp.sum(h_n)
            return loss, (outs, h_n)

    def run(backend):
        _force_backend(backend)
        loss, gx = jax.jit(jax.value_and_grad(
            lambda xx: fwd(xx)[0]))(x)
        _, (outs, h_n) = fwd(x)
        def wloss(p):
            if bidir:
                return esn_mod.run_esn_layer_bidir(
                    p, p_b, x, mask, leak)[0].sum()
            return esn_mod.run_esn_layer(p, x, mask, leak)[0].sum()

        gw = jax.jit(jax.grad(wloss))(p_f)
        return dict(loss=float(loss), outs=np.asarray(outs),
                    h=np.asarray(h_n), gx=np.asarray(gx),
                    gw_max=max(float(np.max(np.abs(gw["w_ih"]))),
                               float(np.max(np.abs(gw["w_hh"])))))

    s, p = run("scan"), run("pallas")
    diffs = {
        "loss": abs(s["loss"] - p["loss"]) / (abs(s["loss"]) + 1e-9),
        "outs": float(np.max(np.abs(s["outs"] - p["outs"]))),
        "h": float(np.max(np.abs(s["h"] - p["h"]))),
        "grad_x": float(np.max(np.abs(s["gx"] - p["gx"]))),
        "frozen_w_grad": max(s["gw_max"], p["gw_max"]),
    }
    ok = (diffs["outs"] < 1e-3 and diffs["h"] < 1e-3
          and diffs["grad_x"] < 1e-3 and diffs["loss"] < 1e-5
          and diffs["frozen_w_grad"] == 0.0)
    import jax
    return {"config": f"ESN{'-bidir' if bidir else ''}",
            "shape": [b, t, h, f], "pass": bool(ok),
            "platform": jax.devices()[0].platform,
            "max_abs_diffs": {k: round(v, 8) for k, v in diffs.items()}}


def main():
    b, t, h, f = (int(a) for a in (sys.argv[1:] + [8, 37, 256, 65][
        len(sys.argv) - 1:]))
    results = []
    for rnn_type in ("LSTM", "GRU", "RNN"):
        for bidir in (False, True):
            r = probe(rnn_type, bidir, b, t, h, f)
            print(json.dumps(r))
            results.append(r)
    for bidir in (False, True):
        r = probe_esn(bidir, b, t, h, f)
        print(json.dumps(r))
        results.append(r)
    ok = all(r["pass"] for r in results)
    print(json.dumps({"all_pass": ok,
                      "configs": [r["config"] for r in results]}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

"""On-hardware gradient-parity probe: Pallas LSTM layer vs lax.scan.

The Pallas kernels are unit-tested in interpret mode (CPU); this probe
runs the REAL compiled kernel on the attached TPU and compares the layer
outputs, final states, and parameter/input gradients against the scan
path.  A silent mismatch here would corrupt training whenever the
backend auto-selection (utils/backend_select.py) picks 'pallas'.

Usage: python scripts/pallas_grad_parity.py [B] [T] [H] [IN]
Prints one JSON line with max-abs diffs and a pass flag.
"""

import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)

import numpy as np


def main():
    b, t, h, f = (int(a) for a in (sys.argv[1:] + [8, 37, 256, 65][
        len(sys.argv) - 1:]))
    import jax
    import jax.numpy as jnp

    from seq2seq_abcd_vae_tpu.models import initializers as init
    from seq2seq_abcd_vae_tpu.models import rnn as rnn_mod

    rng = np.random.default_rng(0)
    params = init.rnn_gate_params(jax.random.PRNGKey(0), f, h, 4)
    x = jnp.asarray(rng.normal(size=(b, t, f)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, t + 1, size=(b,)))
    lengths = lengths.at[0].set(t)
    mask = jnp.arange(t)[None, :] < lengths[:, None]

    def loss_fn(params, x, backend):
        os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
        rnn_mod.resolved_backend.cache_clear() if hasattr(
            rnn_mod.resolved_backend, "cache_clear") else None
        from seq2seq_abcd_vae_tpu.utils import backend_select
        backend_select.resolve_rnn_backend.cache_clear()
        outs, (h_n, c_n) = rnn_mod.run_rnn_layer("LSTM", params, x, mask)
        return (jnp.sum(outs * outs) * 1e-3 + jnp.sum(h_n) +
                jnp.sum(jnp.tanh(c_n))), (outs, h_n, c_n)

    results = {}
    for backend in ("scan", "pallas"):
        vg = jax.value_and_grad(lambda p, xx: loss_fn(p, xx, backend)[0],
                                argnums=(0, 1))
        # jit per backend (backend resolved at trace time)
        os.environ["SEQ2SEQ_RNN_BACKEND"] = backend
        from seq2seq_abcd_vae_tpu.utils import backend_select
        backend_select.resolve_rnn_backend.cache_clear()
        loss, (gp, gx) = jax.jit(vg)(params, x)
        _, (outs, h_n, c_n) = loss_fn(params, x, backend)
        results[backend] = dict(
            loss=float(loss), outs=np.asarray(outs), h=np.asarray(h_n),
            c=np.asarray(c_n), gx=np.asarray(gx),
            gp={k: np.asarray(v) for k, v in gp.items()})

    s, p = results["scan"], results["pallas"]
    diffs = {
        "loss": abs(s["loss"] - p["loss"]) / (abs(s["loss"]) + 1e-9),
        "outs": float(np.max(np.abs(s["outs"] - p["outs"]))),
        "h": float(np.max(np.abs(s["h"] - p["h"]))),
        "c": float(np.max(np.abs(s["c"] - p["c"]))),
        "grad_x": float(np.max(np.abs(s["gx"] - p["gx"]))),
    }
    for k in s["gp"]:
        diffs["grad_" + k] = float(np.max(np.abs(s["gp"][k] - p["gp"][k])))
    scale = float(np.max(np.abs(s["gx"]))) + 1e-9
    ok = (diffs["outs"] < 1e-3 and diffs["h"] < 1e-3
          and diffs["grad_x"] < max(1e-3, 1e-3 * scale)
          and all(v < 2e-2 for k, v in diffs.items() if k.startswith("grad_")))
    print(json.dumps({"shape": [b, t, h, f], "pass": bool(ok),
                      "platform": jax.devices()[0].platform,
                      "max_abs_diffs": {k: round(v, 8)
                                        for k, v in diffs.items()}}))


if __name__ == "__main__":
    main()

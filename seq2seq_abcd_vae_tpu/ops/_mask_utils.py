"""In-kernel step-mask synthesis from row lengths.

A (T, B, 1) mask tensor streamed into a sequential-grid kernel is the
worst case for TPU tiling: the trailing dim of 1 makes every element
occupy a full 128-lane row, so each per-step (1, B, 1) block is a
128x-inflated DMA, and the XLA-side assembly (stack/flip/shift/convert
of (T, 2, B, 1) masks) cost ~0.8 ms/step at the publication shape
(round-3 device trace).  Every mask in this model is an interval in
step index — forward rows are active while t < len, time-flipped rows
while t >= T - len — so the kernels instead keep ONE (B, 1) float
lengths block resident in VMEM and synthesize the step's mask with the
closed form ``clip(min(t - lo + 1, hi - t), 0, 1)``, exact for integral
values.
"""

from __future__ import annotations

import jax.numpy as jnp


def span_mask(t, nt: int, len_ref, reverse: bool = False):
    """(B, 1) float step mask at step ``t`` of a ``nt``-step grid.

    reverse=False: active while t < len        (interval [0, len)).
    reverse=True : active while t >= nt - len  (interval [nt-len, nt)) —
      the time-flipped row layout the reverse direction streams.
    """
    tf = t.astype(jnp.float32)
    ln = len_ref[:, :]
    if reverse:
        return jnp.clip(jnp.minimum(tf + 1.0 - (nt - ln), nt - tf),
                        0.0, 1.0)
    return jnp.clip(jnp.minimum(tf + 1.0, ln - tf), 0.0, 1.0)

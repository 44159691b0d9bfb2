"""Guaranteed-effective device synchronization for timing code.

``jax.block_until_ready`` is advisory on some transports: the axon TPU
tunnel in this container acks dispatches without waiting for execution
(measured round 3: block returns in 0.06 ms while the dispatched
program still runs for seconds; rounds 1-2 behaved differently again —
the tunnel's semantics change between sessions, so nothing may assume
either behavior).  A host FETCH of a value, by contrast, cannot
complete before the program that produces it has run, and single-device
PjRt executions retire in dispatch order, so fetching anything from the
LAST dispatched program synchronizes everything queued before it.

``wait(tree)`` is therefore the only sync primitive timing code in this
repo may use.  It fetches the smallest array leaf (a scalar metric when
one exists — the common case for train-step metrics); for big leaves it
dispatches a 1-element slice and fetches that, so a 67 MB batch array
never rides the ~1.6 GB/s tunnel just to make a barrier.
"""

from __future__ import annotations

import numpy as np


def wait(tree):
    """Block until every computation producing ``tree`` has executed.

    Works where jax.block_until_ready does not (see module docstring);
    costs one small host fetch (~tunnel round trip).  Returns ``tree``.
    """
    import jax

    leaves = [x for x in jax.tree.leaves(tree)
              if isinstance(x, jax.Array)]
    if leaves:
        smallest = min(leaves, key=lambda a: a.size)
        if smallest.size <= 4096:
            np.asarray(smallest)
        else:
            # tiny slice program + fetch: sync without a bulk transfer
            np.asarray(smallest.ravel()[:1])
    jax.block_until_ready(tree)
    return tree

"""Serving-style persistent encoding.

The reference has no serving story: every ``encode.py`` invocation pays
interpreter start, checkpoint load, and (on this stack) jit compilation
before the first segment comes back.  This package keeps one process
resident — params on device, one compiled program per (bucket, batch)
shape — and answers encode requests with dynamic micro-batching, the
TPU-native serving pattern: requests are grouped by frame-count bucket
and padded onto fixed compiled shapes, so steady-state latency is one
device dispatch, never a recompile.

In-process API: :class:`EncodeService`.  Transport: newline-delimited
JSON over a Unix domain socket (:func:`serve_forever`,
CLI ``ABCD-VAE/serve.py``).
"""

from .server import EncodeService, serve_forever

__all__ = ["EncodeService", "serve_forever"]

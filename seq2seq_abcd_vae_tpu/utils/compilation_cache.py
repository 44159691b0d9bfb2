"""Persistent XLA compilation cache.

TPU compiles of the scan-heavy train step take tens of seconds (minutes
through a remote-compile tunnel); caching them on disk makes every
process after the first start instantly.  Called by the CLI mains and
bench.py; opt out with SEQ2SEQ_ABCD_VAE_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "seq2seq_abcd_vae_tpu", "xla")


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("SEQ2SEQ_ABCD_VAE_NO_COMPILE_CACHE") == "1":
        return
    import jax
    if jax.default_backend() != "tpu":
        # Writing CPU executables to the cache segfaults in this jax
        # build (jax._src.compilation_cache.put_executable_and_time);
        # CPU compiles are cheap anyway.
        return
    cache_dir = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                            _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every compile, even fast ones (default thresholds skip
        # sub-second compiles, which is fine; keep defaults for size).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags

"""Early jax-platform selection for the CLI entry points.

The container's sitecustomize registers the tunneled TPU (axon) PJRT
plugin in every python process and pins ``jax_platforms`` programmatically,
so the ``JAX_PLATFORMS`` env var alone is ignored and ANY default-backend
touch (``jax.default_backend()``, ``jax.devices()``, an unplaced ``jit``)
initializes the tunnel — which blocks indefinitely when the tunnel is
down, even for ``-d cpu`` runs that never use the TPU.

``select_platforms`` must run before the first backend touch:

- ``-d cpu`` (the reference CLI's device flag, learning.py:360) pins
  ``jax_platforms=cpu`` so CPU runs never dial the tunnel.  This must
  beat the env var: the container exports ``JAX_PLATFORMS=axon``
  globally (it is the tunnel boot's fallback-prevention, not a user
  request), so env-first precedence would re-pin the tunnel;
- else ``JAX_PLATFORMS`` env stands (the sitecustomize's programmatic
  pin already matches it).
"""

from __future__ import annotations


def select_platforms(device: str = "") -> None:
    import jax
    if device.startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")

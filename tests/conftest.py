"""Test config: run JAX on a virtual 8-device CPU mesh so multi-chip
sharding tests work without TPU hardware (standard fake-backend trick)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# the persistent compile cache is TPU-only (see utils/compilation_cache);
# belt and braces for tests:
os.environ["SEQ2SEQ_ABCD_VAE_NO_COMPILE_CACHE"] = "1"

# Every XLA:CPU compile adds dozens of memory maps to the process; a full
# suite run (hundreds of compiles) blows past the default
# vm.max_map_count=65530 and XLA segfaults inside backend_compile. Raise
# the limit when we can (container runs as root); harmless otherwise.
try:
    with open("/proc/sys/vm/max_map_count") as f:
        if int(f.read()) < 1048576:
            with open("/proc/sys/vm/max_map_count", "w") as g:
                g.write("1048576")
except OSError:
    pass

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin and pins
# jax_platforms to "axon,cpu" programmatically; override before any backend
# is initialized so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(1111)

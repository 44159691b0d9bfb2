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


# ---------------------------------------------------------------------
# Quick lane: `pytest -m quick` gives sub-3-minute signal on one core
# (the full suite is ~15 min and two capabilities — multihost, serve —
# only run there).  Modules are whole-sale members: every test in a
# listed module is quick-marked, so the lane stays maintainable without
# per-test annotations.  Keep the lane's total under ~3 min when adding
# modules (timings: PROFILE_r04.json quick_lane entry).
QUICK_MODULES = {
    "test_distributions",      # torch-oracle math, no training
    "test_optim",              # SGD/plateau/sparse-embed oracles
    "test_abcd",               # sampler math incl. KL oracles
    "test_stft",               # frontend oracles
    "test_backend_select",     # dispatch-probe logic
    "test_checkpoint_format",  # zip format + migration
    "test_data_pipeline",      # parser/loader/bucketing
    "test_device_cache",
    "test_encoder",            # packed-RNN torch oracles
    "test_decoder",            # decoder vs reference semantics
    "test_native",             # C++ wav loader
    "test_scripts",            # corpus synth + small tools
}

# Individually slow tests inside quick modules (full-Learner lifecycles
# that belong to the heavy lane in spirit): excluding these three cuts
# the lane 7m41s -> <3 min on one core (durations: /tmp quick run,
# 2026-08-19: 219.8s + 72.8s + 32.0s of 429s total).
QUICK_EXCLUDE = {
    "test_learner_bit_parity_cache_vs_streaming",
    "test_learner_resumes_from_v1_pickle_checkpoint",
    "test_batched_equals_per_sequence",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "quick: fast-lane test (<3 min total on one core; run with "
        "`pytest -m quick`)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in QUICK_MODULES and item.originalname not in QUICK_EXCLUDE:
            item.add_marker(pytest.mark.quick)

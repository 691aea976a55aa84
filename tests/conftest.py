"""Test configuration: force CPU backend with 8 virtual devices for SPMD tests.

The image's sitecustomize registers the 'axon' TPU backend at interpreter
start and pins JAX_PLATFORMS=axon, so the env-var route is dead by the time
conftest runs. ``jax.config.update('jax_platforms', ...)`` still wins, and
XLA_FLAGS is read lazily at first CPU-client creation.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# VFDEPTH_TEST_TPU=1 keeps the real TPU backend (for the hardware-marked
# tests, e.g. tests/test_learning_tpu.py); default pins CPU for the suite.
if os.environ.get("VFDEPTH_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache across suite runs: the fast suite's wall time
# is dominated by one-core XLA compiles of near-identical micro models
# (~9 min cold). Entries are keyed by HLO + compile options, so source
# changes that alter a program recompile only that program.
_cache_dir = os.environ.get("VFDEPTH_TEST_CACHE",
                            "/tmp/vfdepth_test_jit_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # older jax without the knobs: run uncached
    pass

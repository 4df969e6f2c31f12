"""Test configuration: run everything on a fake 8-device CPU mesh.

This is the TPU-native answer to "test distributed code without a cluster"
(SURVEY.md §4): XLA's host platform is forced to expose 8 virtual devices so
sharding/collective paths compile and execute in CI, while numerics tests
run on the same backend deterministically.

Must set env vars before jax initializes its backends, hence module scope.
"""

import os
import sys
from pathlib import Path

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU: the ambient sitecustomize registers the TPU plugin and sets
# jax_platforms programmatically, so the env var alone is not enough — the
# config must be overridden after import, before backends initialize.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: identical train-step/sampler HLO across
# tests (and across runs) compiles once. The dir is fingerprinted by the
# host CPU's feature set (see tests/cache_dir.py): XLA:CPU AOT
# executables are microarchitecture-specific, and loading entries
# written by a DIFFERENT host (possible when /tmp outlives a machine
# swap) warns "could lead to execution errors such as SIGILL" and was
# observed to SIGSEGV/SIGABRT mid-suite.
sys.path.insert(0, str(Path(__file__).resolve().parent))
from cache_dir import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

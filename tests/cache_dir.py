"""Host-fingerprinted JAX compilation-cache directory for the tests.

XLA:CPU AOT executables are microarchitecture-specific: loading cache
entries written by a host with a different CPU feature set logs "could
lead to execution errors such as SIGILL" and was observed to
SIGSEGV/SIGABRT mid-suite when /tmp outlived a machine swap. Keying the
directory on the CPU-flags hash makes foreign entries unreachable
(shared logic: diffusion_models_collection_tpu.platform_setup).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diffusion_models_collection_tpu.platform_setup import (  # noqa: E402
    host_fingerprinted_cache_dir,
)


def cpu_cache_dir() -> str:
    # DMC_TPU_TEST_CACHE_BASE: point a second concurrent pytest job at
    # its own cache volume — two processes writing one cache dir can
    # abort in the compile-cache writer.
    import os

    base = os.environ.get(
        "DMC_TPU_TEST_CACHE_BASE", "/tmp/dmc_tpu_test_cache"
    )
    return host_fingerprinted_cache_dir(base)

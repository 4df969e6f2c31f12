"""Platform selection bootstrap for CLI entry points.

Some environments register the TPU PJRT plugin via sitecustomize and set
`jax_platforms` programmatically, which silently overrides the standard
`JAX_PLATFORMS` environment variable. CLIs call `apply_platform_env()`
before first device use so `JAX_PLATFORMS=cpu python train.py ...` always
means what it says (tests rely on the virtual 8-device CPU mesh).
"""

from __future__ import annotations

import hashlib
import os


def host_fingerprinted_cache_dir(base: str) -> str:
    """Persistent-compile-cache dir keyed by the host CPU's feature set.

    XLA:CPU AOT executables are microarchitecture-specific: loading cache
    entries written by a host with a DIFFERENT CPU feature set logs
    "could lead to execution errors such as SIGILL" and was observed to
    SIGSEGV/SIGABRT mid-run when the cache volume outlived a machine
    swap. Keying the directory on the CPU-flags hash makes foreign
    entries unreachable (TPU executables are host-independent — they
    just recompile once per new host into the new subdirectory).
    """
    import platform

    try:
        flags = model = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 Linux: 'flags'; ARM Linux: 'Features' — without the
                # ARM spelling every aarch64 host would hash identically
                # and the protection would silently do nothing there
                if line.startswith(("flags", "Features")) and not flags:
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                # model name distinguishes CPUs whose feature-flag SETS
                # hash identically but whose XLA target-feature choices
                # differ (+prefer-no-scatter/-gather are uarch-dependent
                # XLA decisions, invisible in cpuinfo flags) — a
                # flags-only fingerprint segfaulted mid-suite
                # deserializing such an entry
                if line.startswith("model name") and not model:
                    model = line.split(":", 1)[1].strip()
                if flags and model:
                    break
    except OSError:
        flags = model = "unknown"
    # jaxlib version: the serialized-executable format is not stable
    # across XLA releases — deserializing an old-format entry is another
    # (observed) segfault class
    try:
        import jaxlib.version

        jl = jaxlib.version.__version__
    except Exception:
        jl = "unknown"
    fingerprint = f"{platform.machine()}:{model}:{jl}:{flags}"
    tag = hashlib.sha256(fingerprint.encode()).hexdigest()[:12]
    return os.path.join(base, f"host_{tag}")


def apply_platform_env() -> None:
    value = os.environ.get("JAX_PLATFORMS")
    if not value:
        return
    # Keep the host CPU platform registered even when the env pins an
    # accelerator platform (e.g. JAX_PLATFORMS=axon on tunneled TPUs):
    # the first entry stays the default backend, and host-staged work
    # (factory.init_model_params) still has a cpu backend to run on.
    platforms = [p.strip() for p in value.split(",") if p.strip()]
    if "cpu" not in platforms:
        platforms.append("cpu")
    desired = ",".join(platforms)
    import jax

    try:
        if jax.config.jax_platforms != desired:
            jax.config.update("jax_platforms", desired)
    except Exception:
        pass

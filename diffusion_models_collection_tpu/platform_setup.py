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
        uarch = {}
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                # x86 Linux: 'flags'; ARM Linux: 'Features' — without the
                # ARM spelling every aarch64 host would hash identically
                # and the protection would silently do nothing there
                if key in ("flags", "Features") and not flags:
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                # model name distinguishes CPUs whose feature-flag SETS
                # hash identically but whose XLA target-feature choices
                # differ (+prefer-no-scatter/-gather are uarch-dependent
                # XLA decisions, invisible in cpuinfo flags) — a
                # flags-only fingerprint segfaulted mid-suite
                # deserializing such an entry
                if key == "model name" and not model:
                    model = line.split(":", 1)[1].strip()
                # numeric family/model/stepping: cloud VMs mask the model
                # NAME to a generic string ("Intel(R) Xeon(R) Processor @
                # 2.10GHz") that is identical across different uarchs,
                # but LLVM's uarch detection — which picks the
                # prefer-no-scatter/-gather target features — keys on the
                # CPUID family/model numbers. Observed in round 3: two
                # hosts with identical flags+name but different uarchs
                # collided and cross-loaded AOT entries.
                if key in ("cpu family", "model", "stepping", "microcode",
                           "CPU implementer", "CPU part", "CPU variant"):
                    uarch.setdefault(key, line.split(":", 1)[1].strip())
                if flags and model and len(uarch) >= 4:
                    break
        model += " " + ",".join(
            f"{k}={v}" for k, v in sorted(uarch.items())
        )
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


def configure_compile_cache(base: str = None) -> None:
    """Point JAX at the persistent compilation cache (all CLI entry
    points call this): identical sampler/train-step HLO compiles once per
    host instead of once per process — e.g. the fixture quality loop runs
    evaluate.py per checkpoint, and the InceptionV3 + trajectory programs
    are identical every time. Opt out with DMC_TPU_COMPILE_CACHE=0;
    override the location with DMC_TPU_COMPILE_CACHE_DIR."""
    if os.environ.get("DMC_TPU_COMPILE_CACHE", "1") == "0":
        return
    base = base or os.environ.get(
        "DMC_TPU_COMPILE_CACHE_DIR", "/root/.jax_cache"
    )
    import jax

    try:
        # Never override an already-configured cache dir (e.g. a test
        # harness exporting JAX_COMPILATION_CACHE_DIR to an isolated
        # volume): two processes writing one shared dir can abort in
        # jax's cache writer — the same hazard the dryrun path guards
        # against in __graft_entry__.py.
        if jax.config.jax_compilation_cache_dir is not None:
            return
        jax.config.update(
            "jax_compilation_cache_dir", host_fingerprinted_cache_dir(base)
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization, never a hard requirement


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

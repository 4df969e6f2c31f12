"""Platform selection bootstrap for CLI entry points.

Some environments register the TPU PJRT plugin via sitecustomize and set
`jax_platforms` programmatically, which silently overrides the standard
`JAX_PLATFORMS` environment variable. CLIs call `apply_platform_env()`
before first device use so `JAX_PLATFORMS=cpu python train.py ...` always
means what it says (tests rely on the virtual 8-device CPU mesh).
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    value = os.environ.get("JAX_PLATFORMS")
    if not value:
        return
    import jax

    try:
        if jax.config.jax_platforms != value:
            jax.config.update("jax_platforms", value)
    except Exception:
        pass

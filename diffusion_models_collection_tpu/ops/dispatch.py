"""Kernel dispatch: choose Pallas TPU kernels vs XLA fallbacks.

Policy: Pallas kernels are used automatically when (a) the default backend
is TPU and (b) the op's shape constraints are met; the `use_pallas` context
manager / env var `DMC_TPU_DISABLE_PALLAS=1` force the XLA path for
debugging and parity tests.
"""

from __future__ import annotations

import contextlib
import os
import threading

import jax

_state = threading.local()


def _default_enabled() -> bool:
    if os.environ.get("DMC_TPU_DISABLE_PALLAS", "0") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pallas_enabled() -> bool:
    """True if ops should attempt their Pallas TPU kernel path."""
    override = getattr(_state, "override", None)
    if override is not None:
        return override
    return _default_enabled()


@contextlib.contextmanager
def use_pallas(enabled: bool):
    """Force-enable or force-disable Pallas kernels within a scope."""
    prev = getattr(_state, "override", None)
    _state.override = enabled
    try:
        yield
    finally:
        _state.override = prev

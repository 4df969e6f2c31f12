"""ctypes bindings for the native C++ data-pipeline library.

Loads (building on first use) native/libdmc_native.so and exposes the
fused gather+normalize+flip batch assembly, batched bilinear resize and
denormalize kernels. Every entry point has a numpy fallback, so the
framework works identically without a C++ toolchain — the native path is
a host-throughput optimization (SURVEY.md §2.2: the reference's native
surface lives in its dependencies; ours lives here).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_NATIVE_DIR = _REPO_ROOT / "native"
_LIB_PATH = _NATIVE_DIR / "libdmc_native.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not _LIB_PATH.exists():
                subprocess.run(
                    ["sh", str(_NATIVE_DIR / "build.sh")],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.dmc_native_abi_version.restype = ctypes.c_int
            if lib.dmc_native_abi_version() != 1:
                return None
            lib.dmc_gather_normalize.argtypes = [
                _u8p, _i64p, ctypes.c_void_p, _f32p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.dmc_resize_bilinear.argtypes = [
                _u8p, _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.dmc_denormalize_to_u8.argtypes = [_f32p, _u8p, ctypes.c_int64]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def gather_normalize(
    images: np.ndarray,
    indices: np.ndarray,
    flip_mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Gather images[indices] as float32 HWC in [-1, 1], flipping where
    flip_mask is set. images: (N, H, W, C) uint8 contiguous."""
    lib = _load()
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    n, h, w, c = images.shape
    batch = len(indices)
    if lib is None or not images.flags["C_CONTIGUOUS"]:
        out = images[indices].astype(np.float32) / 255.0 * 2.0 - 1.0
        if flip_mask is not None and flip_mask.any():
            out[flip_mask.astype(bool)] = out[flip_mask.astype(bool), :, ::-1]
        return out
    out = np.empty((batch, h, w, c), dtype=np.float32)
    mask_ptr = None
    if flip_mask is not None:
        flip_mask = np.ascontiguousarray(flip_mask, dtype=np.uint8)
        mask_ptr = flip_mask.ctypes.data_as(ctypes.c_void_p)
    lib.dmc_gather_normalize(images, indices, mask_ptr, out, batch, h, w, c)
    return out


def resize_bilinear_batch(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Batched uint8 bilinear resize (N, H, W, C) -> (N, dh, dw, C)."""
    lib = _load()
    n, sh, sw, c = src.shape
    if sh == dh and sw == dw:
        return src
    if lib is None:
        from .transforms import resize_image

        return np.stack([resize_image(im, (dh, dw)) for im in src])
    src = np.ascontiguousarray(src)
    out = np.empty((n, dh, dw, c), dtype=np.uint8)
    lib.dmc_resize_bilinear(src, out, n, sh, sw, dh, dw, c)
    return out


def denormalize_to_u8(x: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] -> uint8 [0, 255], any shape."""
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    if lib is None:
        return (np.clip((x + 1) * 0.5, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    out = np.empty(x.shape, dtype=np.uint8)
    lib.dmc_denormalize_to_u8(x.reshape(-1), out.reshape(-1), x.size)
    return out

"""Utility functions (parity target: reference utils/helpers.py).

Same public surface adapted to JAX: `set_seed` returns a PRNG key (the
functional-RNG replacement for torch's global seeding), config loading
keeps the reference's importlib `.py`-dict contract (helpers.py:57-70),
image normalize/denormalize and GIF writing are unchanged semantics on
NHWC numpy arrays.
"""

from __future__ import annotations

import importlib.util
import json
import math
import random
import sys
from pathlib import Path
from typing import Iterable, List, Sequence, Tuple, Union

import jax
import numpy as np


def set_seed(seed: int = 42) -> jax.Array:
    """Seed python/numpy RNGs and return the root JAX PRNG key.

    Parity: reference helpers.py:12-19; JAX needs no cudnn-determinism
    knobs — computations are deterministic by construction given the key.
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def resolve_image_size(
    image_size: Union[int, Sequence[int]],
) -> Tuple[int, int]:
    """Normalize image_size to (H, W) (parity: helpers.py:22-34)."""
    if isinstance(image_size, int):
        return (image_size, image_size)
    if isinstance(image_size, (list, tuple)) and len(image_size) == 2:
        h, w = image_size
        if not (isinstance(h, int) and isinstance(w, int)):
            raise ValueError("image_size values must be integers")
        return (h, w)
    raise ValueError("image_size must be int or a pair (H, W)")


def count_parameters(params) -> int:
    """Total parameter count of a pytree (parity: helpers.py:37-39)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def get_device(device_id: int = None):
    """Return a jax device (parity: reference helpers.py:42-46).

    Placement is normally implicit via sharding/jit; this exists for API
    parity and for explicit `jax.device_put` calls.
    """
    devices = jax.devices()
    if device_id is not None:
        return devices[device_id]
    return devices[0]


def load_config(config_path: Union[str, Path]) -> dict:
    """Load a config dict from a `.py` module (parity: helpers.py:57-70)
    or, as extensions, a `.json` or `.yaml`/`.yml` file (the reference's
    README advertises YAML configs but never implements them — here both
    formats actually work)."""
    path = Path(config_path)
    if path.suffix == ".json":
        with path.open("r", encoding="utf-8") as f:
            return json.load(f)
    if path.suffix in (".yaml", ".yml"):
        import yaml

        with path.open("r", encoding="utf-8") as f:
            return yaml.safe_load(f)
    spec = importlib.util.spec_from_file_location("config", path)
    config_module = importlib.util.module_from_spec(spec)
    sys.modules["config"] = config_module
    spec.loader.exec_module(config_module)
    return config_module.config


def save_config(config: dict, save_path: Union[str, Path]) -> None:
    """Save config as JSON (parity: helpers.py:49-54)."""
    with Path(save_path).open("w", encoding="utf-8") as f:
        json.dump(config, f, indent=4, default=str)


def normalize_to_neg_one_to_one(img):
    """[0, 1] -> [-1, 1] (parity: helpers.py:73-75)."""
    return img * 2 - 1


def unnormalize_to_zero_to_one(img):
    """[-1, 1] -> [0, 1] (parity: helpers.py:78-80)."""
    return (img + 1) * 0.5


def _to_uint8_hwc(img: np.ndarray) -> np.ndarray:
    """Accept HWC or CHW float [0,1]/uint8 arrays, return HWC uint8."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
        img = np.transpose(img, (1, 2, 0))
    if img.dtype != np.uint8:
        img = np.clip(img, 0.0, 1.0) if img.max() <= 1.0 else img / 255.0
        img = (np.clip(img, 0, 1) * 255).round().astype(np.uint8)
    return img


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2) -> np.ndarray:
    """Tile (N, H, W, C) images into one (GH, GW, C) grid image
    (the torchvision `save_image` grid semantics used at trainer.py:320)."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = nrow
    nrows = math.ceil(n / ncol)
    grid = np.zeros(
        (nrows * h + (nrows + 1) * padding, ncol * w + (ncol + 1) * padding, c),
        dtype=images.dtype,
    )
    for idx in range(n):
        r, col = divmod(idx, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y : y + h, x : x + w] = images[idx]
    return grid


def save_image_grid(
    images: np.ndarray,
    save_path: Union[str, Path],
    nrow: int = 8,
    padding: int = 2,
) -> None:
    """Save (N, H, W, C) images in [0, 1] as a PNG grid."""
    from PIL import Image

    grid = _to_uint8_hwc(make_grid(np.asarray(images, dtype=np.float32), nrow, padding))
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(grid).save(str(save_path))


def save_image(img: np.ndarray, save_path: Union[str, Path]) -> None:
    """Save a single (H, W, C) image in [0, 1] as PNG."""
    from PIL import Image

    arr = _to_uint8_hwc(img)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(str(save_path))


def create_gif(
    images_list: Iterable[np.ndarray],
    save_path: Union[str, Path],
    fps: int = 20,
) -> None:
    """Create a GIF from images (parity: helpers.py:93-133), HWC or CHW."""
    from PIL import Image

    frames: List[Image.Image] = []
    for img in images_list:
        arr = _to_uint8_hwc(np.asarray(img))
        if arr.ndim == 3 and arr.shape[2] == 1:
            arr = arr[..., 0]
        frames.append(Image.fromarray(arr))
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    frames[0].save(
        str(save_path),
        save_all=True,
        append_images=frames[1:],
        duration=1000 / fps,
        loop=0,
    )


def format_duration(total_seconds: float) -> str:
    """'Xh Ym Zs' wall-time string (parity: train.py:354-364)."""
    hours = int(total_seconds // 3600)
    minutes = int((total_seconds % 3600) // 60)
    seconds = total_seconds % 60
    return f"{hours}h {minutes}m {seconds:.1f}s"

"""Native C++ data-pipeline kernels vs numpy references."""

import numpy as np
import pytest

from diffusion_models_collection_tpu.datasets import native
from diffusion_models_collection_tpu.datasets import (
    DataLoader,
    DiffusionDataset,
    ImageTransform,
)


def test_native_library_builds():
    assert native.available(), "C++ pipeline library failed to build/load"


def test_gather_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(10, 8, 8, 3), dtype=np.uint8)
    idx = np.array([3, 1, 7], dtype=np.int64)
    out = native.gather_normalize(images, idx)
    expected = images[idx].astype(np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_gather_normalize_flip():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(4, 4, 6, 2), dtype=np.uint8)
    idx = np.arange(4, dtype=np.int64)
    mask = np.array([1, 0, 1, 0], dtype=np.uint8)
    out = native.gather_normalize(images, idx, mask)
    expected = images.astype(np.float32) / 255.0 * 2 - 1
    expected[[0, 2]] = expected[[0, 2], :, ::-1]
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_resize_bilinear_identity():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    out = native.resize_bilinear_batch(src, 8, 8)
    np.testing.assert_array_equal(out, src)


def test_resize_bilinear_matches_pil():
    from diffusion_models_collection_tpu.datasets.transforms import resize_image

    rng = np.random.default_rng(2)
    src = rng.integers(0, 256, size=(3, 16, 16, 3), dtype=np.uint8)
    out = native.resize_bilinear_batch(src, 8, 8)
    for i in range(3):
        expected = resize_image(src[i], (8, 8))
        diff = np.abs(out[i].astype(int) - expected.astype(int))
        # PIL uses fixed-point arithmetic; allow off-by-2 per channel
        assert diff.max() <= 2, diff.max()


def test_denormalize_roundtrip():
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, size=(2, 4, 4, 3), dtype=np.uint8)
    norm = u8.astype(np.float32) / 255.0 * 2 - 1
    back = native.denormalize_to_u8(norm)
    np.testing.assert_array_equal(back, u8)


def test_loader_fast_path_matches_slow_path():
    """The fused native batch assembly must produce exactly the per-item
    Python path's output (same transform, same flip stream)."""
    ds = DiffusionDataset(
        "synthetic", conditional=True,
        transform=ImageTransform((16, 16), train=True), image_size=(16, 16),
        n_train=64,
    )
    fast = DataLoader(ds, batch_size=16, seed=3, prefetch=0)
    assert fast._fast_images is not None
    slow = DataLoader(ds, batch_size=16, seed=3, prefetch=0)
    slow._fast_images = None  # force per-item path
    for (fi, fl), (si, sl) in zip(fast, slow):
        np.testing.assert_allclose(fi, si, atol=1e-6)
        np.testing.assert_array_equal(fl, sl)


def test_loader_fast_path_with_resize():
    ds = DiffusionDataset(
        "synthetic", conditional=False,
        transform=ImageTransform((8, 8), train=False), image_size=(16, 16),
        n_train=32,
    )
    loader = DataLoader(ds, batch_size=8, seed=0, prefetch=0)
    imgs, _ = next(iter(loader))
    assert imgs.shape == (8, 8, 8, 3)
    assert -1.0 <= imgs.min() and imgs.max() <= 1.0

"""Dataset readers, transforms, loader sharding/shuffling semantics."""

import json

import numpy as np
import pytest

from diffusion_models_collection_tpu.datasets import (
    CustomImageDataset,
    DataLoader,
    DiffusionDataset,
    ImageTransform,
    flip_batch,
)


def test_synthetic_dataset():
    ds = DiffusionDataset("synthetic", conditional=True,
                          transform=ImageTransform((32, 32), train=False))
    img, label = ds[0]
    assert img.shape == (32, 32, 3)
    assert img.dtype == np.float32
    assert -1.0 <= img.min() and img.max() <= 1.0
    assert 0 <= label < 10
    assert len(ds) == 512
    assert DiffusionDataset.get_num_classes("synthetic") == 10


def test_unsupported_dataset():
    with pytest.raises(ValueError):
        DiffusionDataset("imagenet1000")


def test_missing_files_raise():
    with pytest.raises(FileNotFoundError):
        DiffusionDataset("cifar10", root="/tmp/definitely-missing-dir-xyz")


def test_num_classes_and_channels():
    assert DiffusionDataset.get_num_classes("cifar10") == 10
    assert DiffusionDataset.get_num_classes("cifar100") == 100
    assert DiffusionDataset.get_num_classes("celeba") == 0
    assert DiffusionDataset.get_image_channels("mnist") == 1
    assert DiffusionDataset.get_image_channels("cifar10") == 3


def test_transform_resize_and_normalize():
    t = ImageTransform((16, 16), train=False)
    img = np.full((32, 32, 3), 255, dtype=np.uint8)
    out = t(img)
    assert out.shape == (16, 16, 3)
    np.testing.assert_allclose(out, 1.0)
    t2 = ImageTransform((8, 8), train=False, grayscale=True)
    out2 = t2(np.zeros((8, 8), dtype=np.uint8))
    assert out2.shape == (8, 8, 1)
    np.testing.assert_allclose(out2, -1.0)


def test_flip_batch():
    rng = np.random.default_rng(0)
    batch = np.arange(2 * 1 * 4 * 1, dtype=np.float32).reshape(2, 1, 4, 1)
    flipped = flip_batch(batch.copy(), rng)
    for i in range(2):
        ok_same = np.array_equal(flipped[i], batch[i])
        ok_flip = np.array_equal(flipped[i], batch[i, :, ::-1])
        assert ok_same or ok_flip


def _make_custom_tree(tmp_path, n_classes=2, per_class=3):
    from PIL import Image

    for c in range(n_classes):
        d = tmp_path / f"class_{c}"
        d.mkdir(parents=True)
        for i in range(per_class):
            arr = np.full((8, 8, 3), c * 100 + i, dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img{i}.png")
    return tmp_path


def test_custom_dataset_subdirs(tmp_path):
    root = _make_custom_tree(tmp_path)
    ds = CustomImageDataset(
        str(root), conditional=True, use_subdirs=True,
        transform=ImageTransform((8, 8), train=False),
    )
    assert len(ds) == 6
    assert ds.num_classes == 2
    img, label = ds[0]
    assert img.shape == (8, 8, 3)
    assert label in (0, 1)


def test_custom_dataset_flat(tmp_path):
    from PIL import Image

    for i in range(4):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / f"im{i}.jpg"
        )
    ds = CustomImageDataset(str(tmp_path),
                            transform=ImageTransform((8, 8), train=False))
    assert len(ds) == 4
    assert ds[0].shape == (8, 8, 3)


def test_custom_dataset_json_label_remap(tmp_path):
    """JSON labels remapped to consecutive indices (custom_dataset.py:105-121)."""
    from PIL import Image

    for i in range(3):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / f"im{i}.png"
        )
    labels = {"im0.png": 7, "im1.png": 3, "im2.png": 7}
    label_file = tmp_path / "labels.json"
    label_file.write_text(json.dumps(labels))
    ds = CustomImageDataset(
        str(tmp_path), conditional=True, label_file=str(label_file),
        transform=ImageTransform((8, 8), train=False),
    )
    assert ds.num_classes == 2
    got = [ds[i][1] for i in range(3)]
    assert got == [1, 0, 1]  # 3 -> 0, 7 -> 1


def test_custom_conditional_requires_source(tmp_path):
    with pytest.raises(ValueError):
        CustomImageDataset(str(tmp_path), conditional=True)


def test_loader_batching_and_epoch_shuffle():
    ds = DiffusionDataset("synthetic", conditional=True,
                          transform=ImageTransform((16, 16), train=False))
    loader = DataLoader(ds, batch_size=64, seed=1, prefetch=2)
    assert len(loader) == 8  # 512 / 64
    batches = list(loader)
    assert len(batches) == 8
    imgs, labels = batches[0]
    assert imgs.shape == (64, 16, 16, 3)
    assert labels.shape == (64,)
    # epoch reshuffle changes batch content deterministically
    loader.set_epoch(0)
    b0 = next(iter(loader))[0]
    loader.set_epoch(1)
    b1 = next(iter(loader))[0]
    loader.set_epoch(0)
    b0_again = next(iter(loader))[0]
    assert not np.array_equal(b0, b1)
    np.testing.assert_array_equal(b0, b0_again)


def test_loader_process_sharding():
    """Per-process shards are disjoint and cover the dataset."""
    ds = DiffusionDataset("synthetic",
                          transform=ImageTransform((16, 16), train=False))
    idx_sets = []
    for pidx in range(4):
        loader = DataLoader(
            ds, batch_size=32, shuffle=False, process_index=pidx,
            process_count=4, prefetch=0,
        )
        idx_sets.append(set(loader._epoch_indices().tolist()))
    assert all(len(s) == 128 for s in idx_sets)
    union = set().union(*idx_sets)
    assert union == set(range(512))


def test_loader_drop_last():
    ds = DiffusionDataset("synthetic",
                          transform=ImageTransform((16, 16), train=False))
    loader = DataLoader(ds, batch_size=100, drop_last=True, prefetch=0)
    assert len(loader) == 5
    loader2 = DataLoader(ds, batch_size=100, drop_last=False, prefetch=0)
    assert len(loader2) == 6
    sizes = [b[0].shape[0] for b in loader2]
    assert sizes[-1] == 12


def _make_celeba_tree(tmp_path, n=24, size=(44, 36)):
    """Synthetic CelebA-layout tree: img_align_celeba/ JPEGs + partition
    file (torchvision layout, reference base_dataset.py:61-68)."""
    from PIL import Image

    img_dir = tmp_path / "celeba" / "img_align_celeba"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        name = f"{i + 1:06d}.jpg"
        arr = rng.integers(0, 255, size=size + (3,), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / name, quality=95)
        lines.append(f"{name} {0 if i < n - 4 else 2}")
    (tmp_path / "celeba" / "list_eval_partition.txt").write_text(
        "\n".join(lines) + "\n"
    )
    return tmp_path


def test_celeba_lazy_pipeline_paths_agree(tmp_path):
    """The three lazy-dataset pipelines — serial per-item decode, the
    decode thread pool, and the one-time decoded-uint8 cache — must yield
    identical batches (same shuffle/flip streams, same pixels)."""
    from diffusion_models_collection_tpu.datasets import (
        DataLoader,
        DiffusionDataset,
        ImageTransform,
    )

    root = _make_celeba_tree(tmp_path)
    size = (16, 16)

    def batches(**kw):
        ds = DiffusionDataset(
            "celeba", root=str(root), train=True,
            transform=ImageTransform(size, train=True),
        )
        loader = DataLoader(ds, batch_size=5, seed=3, prefetch=0, **kw)
        loader.set_epoch(2)
        return [img for img, _ in loader]

    serial = batches(num_workers=0)
    pooled = batches(num_workers=4)
    cached = batches(num_workers=4, cache_decoded=True)
    assert len(serial) == 4  # 20 train imgs / batch 5
    for s, p, c in zip(serial, pooled, cached):
        np.testing.assert_array_equal(s, p)
        # cache stores uint8 post-resize; normalization then happens in the
        # fused native kernel — bit-identical to the per-item float path
        np.testing.assert_allclose(s, c, atol=1e-6)


def test_celeba_split_partition(tmp_path):
    from diffusion_models_collection_tpu.datasets import DiffusionDataset

    root = _make_celeba_tree(tmp_path)
    train = DiffusionDataset("celeba", root=str(root), train=True)
    test = DiffusionDataset("celeba", root=str(root), train=False)
    assert len(train) == 20 and len(test) == 4
    assert train.raw_image(0).shape == (44, 36, 3)

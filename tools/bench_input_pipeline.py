"""Input-pipeline throughput bench for lazy (JPEG-file-backed) datasets.

Round-1 VERDICT weak-spot 5: CelebA bypassed the native fast path (serial
PIL decode per item). Measures loader imgs/s on a synthetic CelebA-layout
tree (218x178 JPEGs -> 64x64 train batches, the celeba64_unet.py shape)
for: serial decode, decode thread pool, and the one-time decoded-uint8
cache. Host-only (no TPU).

    python tools/bench_input_pipeline.py [--n 2000] [--batch 256]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diffusion_models_collection_tpu.datasets import (
    DataLoader,
    DiffusionDataset,
    ImageTransform,
)


def make_tree(root: Path, n: int):
    from PIL import Image

    img_dir = root / "celeba" / "img_align_celeba"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    # photo-like content (smooth gradients, not uint8 noise): decode cost
    # of a noise JPEG is all entropy decoding, which misrepresents real
    # CelebA photos where the DCT/IDCT side matters
    base = rng.integers(0, 255, size=(28, 23, 3), dtype=np.uint8)
    arr = np.asarray(Image.fromarray(base).resize((178, 218), Image.BILINEAR))
    for i in range(n):
        name = f"{i + 1:06d}.jpg"
        # shift pixels per image so JPEG sizes vary realistically
        Image.fromarray(np.roll(arr, i * 7, axis=0)).save(
            img_dir / name, quality=90
        )
        lines.append(f"{name} 0")
    (root / "celeba" / "list_eval_partition.txt").write_text(
        "\n".join(lines) + "\n"
    )


def epoch_rate(loader, n):
    t0 = time.perf_counter()
    count = 0
    for img, _ in loader:
        count += len(img)
    return count / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        make_tree(root, args.n)
        size = (64, 64)
        results = {}

        def loader(**kw):
            ds = DiffusionDataset(
                "celeba", root=str(root), train=True,
                transform=ImageTransform(size, train=True),
            )
            return DataLoader(ds, batch_size=args.batch, seed=0, **kw)

        # PIL-forced baseline (what the pipeline does without libjpeg)
        from diffusion_models_collection_tpu.datasets import native as nat

        orig_decode = nat.decode_image_file
        nat.decode_image_file = lambda p, min_hw=None: None
        try:
            results["pil_serial_imgs_per_s"] = round(
                epoch_rate(loader(num_workers=0), args.n), 1)
        finally:
            nat.decode_image_file = orig_decode
        results["serial_imgs_per_s"] = round(
            epoch_rate(loader(num_workers=0), args.n), 1)
        results["fast_jpeg_imgs_per_s"] = round(
            epoch_rate(loader(num_workers=0, fast_jpeg_decode=True),
                       args.n), 1)
        results[f"pool{args.workers}_imgs_per_s"] = round(
            epoch_rate(loader(num_workers=args.workers), args.n), 1)
        t0 = time.perf_counter()
        cached = loader(num_workers=args.workers, cache_decoded=True)
        results["cache_build_s"] = round(time.perf_counter() - t0, 2)
        results["cached_imgs_per_s"] = round(epoch_rate(cached, args.n), 1)
        print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Generate metric-port golden activations against the CANONICAL graphs.

Run this ONCE in an environment that has `torchvision` (and optionally
`lpips`) installed — this repo's environment has neither (zero egress), so
the output .npz is the portable evidence bundle that lets the gated test
`tests/test_metrics.py::test_metric_goldens` numerically validate our Flax
InceptionV3 / AlexNet-LPIPS ports anywhere:

    python tools/make_metric_goldens.py --out metric_goldens.npz \
        [--inception-weights inception_v3_google-0cc3c7bd.pth] \
        [--lpips-weights <lpips .pth>]

With --inception-weights the canonical graph runs the PRETRAINED weights
(golden validates the calibrated FID/IS path end to end); without, it runs
torchvision's random init — which still pins every structural detail of
the graph (padding, pool semantics, BN eps, block wiring), the round-1
gap: our port had only been validated against its own inverse converter.

The bundle contains:
  inputs            (8, 299, 299, 3) NHWC float32 in [0, 1], fixed seed
  small_inputs      (8, 32, 32, 3)   — exercises the resize path
  pool/logits[...]  canonical torchvision outputs for both input sets
  state::<key>      the exact torch state_dict the goldens were made with
  lpips_inputs/lpips_dists  (optional) canonical lpips-alex distances

The consuming test converts state:: via our own
`load_torchvision_weights` and compares our TPU-port outputs — so one
bundle validates converter AND graph AND preprocessing together.
"""

import argparse
import io

import numpy as np
import torch


def _fixed_inputs(n=8, size=299, seed=1234):
    rng = np.random.default_rng(seed)
    # structured, not pure noise: gradients + noise exercise resize and
    # BN paths with realistic dynamic range
    base = np.linspace(0, 1, size, dtype=np.float32)
    imgs = rng.random((n, size, size, 3), dtype=np.float32) * 0.5
    imgs += 0.5 * base[None, :, None, None]
    return np.clip(imgs, 0.0, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="metric_goldens.npz")
    ap.add_argument("--inception-weights", default=None)
    ap.add_argument("--lpips-weights", default=None)
    args = ap.parse_args()

    import torchvision

    bundle = {}

    # --------------------------------------------------------- inception
    model = torchvision.models.inception_v3(
        weights=None, transform_input=False, aux_logits=True, init_weights=True
    )
    if args.inception_weights:
        state = torch.load(args.inception_weights, map_location="cpu",
                           weights_only=True)
        model.load_state_dict(state)
        bundle["pretrained"] = np.array(True)
    else:
        torch.manual_seed(0)
        for m in model.modules():  # deterministic random BN stats too
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
        bundle["pretrained"] = np.array(False)
    model.eval()

    for key, tensor in model.state_dict().items():
        bundle[f"state::{key}"] = tensor.numpy()

    def run_canonical(images01_nhwc):
        """Exactly the reference metrics/fid.py:84-88 path: bilinear 299
        resize, [0,1] -> [-1,1], NCHW."""
        x = torch.from_numpy(images01_nhwc).permute(0, 3, 1, 2)
        if x.shape[-1] != 299:
            x = torch.nn.functional.interpolate(
                x, size=(299, 299), mode="bilinear", align_corners=False
            )
        x = x * 2 - 1
        with torch.no_grad():
            # pool features: forward through all blocks, adaptive avgpool
            feats = model.Conv2d_1a_3x3(x)
            feats = model.Conv2d_2a_3x3(feats)
            feats = model.Conv2d_2b_3x3(feats)
            feats = model.maxpool1(feats)
            feats = model.Conv2d_3b_1x1(feats)
            feats = model.Conv2d_4a_3x3(feats)
            feats = model.maxpool2(feats)
            for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                         "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                         "Mixed_7a", "Mixed_7b", "Mixed_7c"):
                feats = getattr(model, name)(feats)
            pool = torch.flatten(model.avgpool(feats), 1)
            logits = model.fc(pool)
        return pool.numpy(), logits.numpy()

    inputs = _fixed_inputs(size=299)
    small = _fixed_inputs(size=32, seed=4321)
    bundle["inputs"] = inputs
    bundle["small_inputs"] = small
    bundle["pool"], bundle["logits"] = run_canonical(inputs)
    bundle["pool_small"], bundle["logits_small"] = run_canonical(small)

    # ------------------------------------------------------------- lpips
    try:
        import lpips

        net = lpips.LPIPS(net="alex")
        if args.lpips_weights:
            net.load_state_dict(
                torch.load(args.lpips_weights, map_location="cpu"),
                strict=False,
            )
        net.eval()
        la = _fixed_inputs(n=8, size=64, seed=7) * 2 - 1
        lb = _fixed_inputs(n=8, size=64, seed=8) * 2 - 1
        with torch.no_grad():
            d = net(
                torch.from_numpy(la).permute(0, 3, 1, 2),
                torch.from_numpy(lb).permute(0, 3, 1, 2),
            )
        bundle["lpips_inputs_a"] = la
        bundle["lpips_inputs_b"] = lb
        bundle["lpips_dists"] = d.reshape(-1).numpy()
        for key, tensor in net.state_dict().items():
            bundle[f"lpips_state::{key}"] = tensor.numpy()
    except ImportError:
        print("lpips not installed — skipping LPIPS goldens")

    buf = io.BytesIO()
    np.savez_compressed(buf, **bundle)
    with open(args.out, "wb") as f:
        f.write(buf.getvalue())
    print(f"wrote {args.out} ({len(bundle)} arrays)")


if __name__ == "__main__":
    main()

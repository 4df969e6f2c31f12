"""Real-data readiness harness (round-1 VERDICT next-step 5).

One command that, given a dataset on disk (real CIFAR-10/MNIST in the
torchvision layout — or, with --fixtures, the committed tiny real-format
fixtures at tests/fixtures/data), runs the reference experiment protocol
end to end and records the evidence the reference's docs/cifar10_runs.md
rests on:

  1. `--check`: report which supported datasets are present under
     --data_root and whether their files parse.
  2. protocol run (default): train for --epochs with per-epoch
     checkpoints -> sample a grid from the final checkpoint -> evaluate
     FID/IS/LPIPS at the FIRST and LAST checkpoint -> write a JSON report
     asserting (a) train loss decreased and (b) FID improved across
     checkpoints. Without pretrained InceptionV3 weights the FID is
     uncalibrated but still a consistent comparison statistic; set
     DMC_TPU_INCEPTION_WEIGHTS (or --inception_weights) the moment
     weights are available and the same command produces calibrated
     numbers.

Examples:
    python tools/prepare_data.py --check --data_root ./data
    python tools/prepare_data.py --fixtures --dataset cifar10 \
        --epochs 3 --out /tmp/readiness.json
    python tools/prepare_data.py --dataset cifar10 --data_root ./data \
        --config configs/cifar10_unet.py --epochs 3
"""

import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
FIXTURES = REPO / "tests/fixtures/data"


def check(data_root: Path) -> dict:
    sys.path.insert(0, str(REPO))
    from diffusion_models_collection_tpu.datasets import DiffusionDataset

    report = {}
    for name in ("cifar10", "cifar100", "mnist", "fashionmnist", "celeba"):
        try:
            ds = DiffusionDataset(name, root=str(data_root), train=True)
            img = ds.raw_image(0)
            report[name] = {"present": True, "n_train": len(ds),
                            "image_shape": list(img.shape)}
        except FileNotFoundError as e:
            report[name] = {"present": False, "error": str(e).split(";")[0]}
    return report


def run(cmd, cwd):
    print("+", " ".join(str(c) for c in cmd), file=sys.stderr)
    proc = subprocess.run([sys.executable] + [str(c) for c in cmd],
                          capture_output=True, text=True, cwd=str(cwd))
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        raise SystemExit(f"command failed: {cmd[0]}")
    return proc.stdout


def protocol(args) -> dict:
    workdir = Path(args.workdir).resolve()
    workdir.mkdir(parents=True, exist_ok=True)
    data_root = FIXTURES if args.fixtures else Path(args.data_root).resolve()

    # overlay config: base (.py dict) + dataset/output/epoch overrides
    sys.path.insert(0, str(REPO))
    from diffusion_models_collection_tpu.utils.helpers import load_config

    config = dict(load_config(str(REPO / args.config)))
    config.update(
        dataset=args.dataset, data_root=str(data_root), epochs=args.epochs,
        save_interval=1, save_dir=str(workdir / "ckpt"),
        sample_dir=str(workdir / "samples"), use_swanlab=False,
        resume_path=None,
    )
    if args.fixtures:  # tiny data: keep steps meaningful
        config["batch_size"] = min(config.get("batch_size", 128), 32)
    cfg_path = workdir / "protocol_config.py"
    cfg_path.write_text(f"config = {config!r}\n")

    out = run([REPO / "train.py", "--config", cfg_path], workdir)
    losses = [float(m) for m in re.findall(r"Loss: ([0-9.]+)", out)]

    ckpts = sorted((workdir / "ckpt").glob("model_epoch_*.ckpt"))
    first_ckpt, last_ckpt = ckpts[0], ckpts[-1]

    run([REPO / "sample.py", "--checkpoint", last_ckpt,
         "--sampling_method", "ddim", "--num_inference_steps", "25",
         "--num_samples", "16", "--batch_size", "16",
         "--output_dir", workdir / "grid"], workdir)

    fids = {}
    for tag, ckpt in (("first", first_ckpt), ("last", last_ckpt)):
        out_json = workdir / f"metrics_{tag}.json"
        cmd = [REPO / "evaluate.py", "--checkpoint", ckpt,
               "--num_samples", str(args.eval_samples),
               "--batch_size", "16", "--output", out_json]
        if args.inception_weights:
            cmd += ["--inception_weights", args.inception_weights]
        run(cmd, workdir)
        fids[tag] = json.loads(out_json.read_text())

    report = {
        "dataset": args.dataset,
        "data_root": str(data_root),
        "epochs": args.epochs,
        "losses": losses,
        "loss_decreased": bool(losses and min(losses[1:] or losses)
                               < losses[0]),
        "fid_first": fids["first"].get("metrics", fids["first"]).get("FID"),
        "fid_last": fids["last"].get("metrics", fids["last"]).get("FID"),
        "calibrated": bool(args.inception_weights),
    }
    report["fid_improved"] = (
        report["fid_last"] is not None
        and report["fid_first"] is not None
        and report["fid_last"] < report["fid_first"]
    )
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="only report dataset presence under --data_root")
    ap.add_argument("--data_root", default="./data")
    ap.add_argument("--fixtures", action="store_true",
                    help="use the committed tiny real-format fixtures")
    ap.add_argument("--dataset", default="cifar10")
    ap.add_argument("--config", default="configs/cifar10_unet.py")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--eval_samples", type=int, default=64)
    ap.add_argument("--workdir", default="/tmp/dmc_tpu_readiness")
    ap.add_argument("--inception_weights", default=None)
    ap.add_argument("--out", default=None, help="report JSON path")
    args = ap.parse_args()

    if args.check:
        report = check(Path(args.data_root))
    else:
        report = protocol(args)
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text + "\n")


if __name__ == "__main__":
    main()

"""Latent-diffusion + super-resolution quality runs on the fixtures.

Round-3 VERDICT next-step 8: the latent (283 samples/s) and SR cascade
(14.8/s) bench rows were speed-only. This tool runs both pipelines'
full quality loops in-env on the committed CIFAR fixtures
(tests/fixtures/data, 200 genuine images), producing SWD (calibrated,
weight-free) + relative FID/KID rows against the same 200 real images
used by docs/fixture_quality_run.md — so latent/SR quality is directly
comparable to the pixel-space UNet rows.

Phases (resumable; each caches its artifacts under --workdir):

  vae    — train the f=2 KL-VAE (configs/cifar10_vae.py geometry) on the
           fixtures; report the RECONSTRUCTION quality row (SWD of
           encode->decode vs real), the ceiling for any latent model.
  latent — calibrate latent_scale_factor (tools/compute_latent_scale
           logic), train the 16x16x4 latent UNet
           (configs/cifar10_latent_unet.py geometry, T=200 fixture
           recipe), evaluate DDIM-50 through evaluate.py (samples
           latents, decodes through the VAE).
  sr     — train the SR3-style 16->32 upsampler (celeba64_sr_unet.py
           recipe at fixture scale: LR = exact area downsample computed
           in-step), then super-resolve the downsampled fixtures and
           report SWD/rel-FID vs the true 32x32 images, next to the
           bilinear-upsample baseline row (what the model must beat).

    python tools/pipelines_quality_run.py                # all phases
    python tools/pipelines_quality_run.py --phases sr

Writes docs/pipelines_quality_run.md + JSON artifacts under
docs/assets/pipelines_quality/.
"""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
FIXTURES = REPO / "tests/fixtures/data"
DOC = REPO / "docs/pipelines_quality_run.md"
ASSETS = REPO / "docs/assets/pipelines_quality"

EVAL_KEYS = ("FID", "KID_mean", "swd_avg", "IS_mean", "LPIPS_diversity")
PHASES = ("vae", "latent", "sr")


def run(cmd, cwd=REPO, timeout=1800, retries=1):
    """CLI leg with a tunnel-wedge watchdog (see fixture_quality_run.run):
    kill on timeout, retry once; training legs pass a longer timeout."""
    import subprocess

    for attempt in range(retries + 1):
        print("+", " ".join(str(c) for c in cmd), file=sys.stderr,
              flush=True)
        try:
            proc = subprocess.run(
                [sys.executable] + [str(c) for c in cmd],
                capture_output=True, text=True, cwd=str(cwd),
                timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            print(f"leg timed out after {timeout}s (tunnel wedge?) — "
                  f"attempt {attempt + 1}/{retries + 1}",
                  file=sys.stderr, flush=True)
            continue
        if proc.returncode == 0:
            return proc.stdout
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        if attempt < retries:
            print(f"leg failed rc={proc.returncode} — retrying",
                  file=sys.stderr, flush=True)
    raise SystemExit(f"command failed after {retries + 1} attempts: "
                     f"{cmd[0]}")


def write_cfg(args, name, cfg):
    p = args.workdir / f"{name}.py"
    p.write_text(f"config = {cfg!r}\n")
    return p


def load_base(name):
    sys.path.insert(0, str(REPO))
    from diffusion_models_collection_tpu.utils.helpers import load_config

    return dict(load_config(str(REPO / f"configs/{name}.py")))


def fixture_common(args, cfg):
    cfg.update(dataset="cifar10", data_root=str(FIXTURES),
               batch_size=32, num_workers=0, use_swanlab=False,
               resume_path=None, seed=args.seed, use_scheduler=False)
    return cfg


def real_images(args, n=200):
    """The 200 fixture images in [0,1] NHWC (the SWD/FID reference set)."""
    import numpy as np

    from diffusion_models_collection_tpu.datasets import DataLoader
    from diffusion_models_collection_tpu.factory import get_dataset

    cfg = {"dataset": "cifar10", "data_root": str(FIXTURES),
           "image_size": (32, 32), "conditional": False}
    ds = get_dataset(cfg, train=False)
    loader = DataLoader(ds, batch_size=50, shuffle=True, drop_last=False,
                        seed=args.seed, random_flip=False)
    out = []
    for batch in loader:
        imgs = batch[0] if isinstance(batch, (tuple, list)) else batch
        out.append(np.asarray(imgs))
        if sum(len(o) for o in out) >= n:
            break
    x = np.concatenate(out, axis=0)[:n]
    return (x + 1.0) / 2.0  # model space [-1,1] -> [0,1]


def rel_metrics(real01, fake01):
    """SWD + relative FID/KID of two [0,1] image sets (in-process analog
    of evaluate.py's metric block, for outputs evaluate.py can't produce
    itself — VAE reconstructions, SR conditioned generations)."""
    from diffusion_models_collection_tpu.metrics import (
        calculate_all_metrics, compute_swd,
    )

    m = calculate_all_metrics(real01, fake01)
    m.pop("_uncalibrated", None)
    m.update(compute_swd(real01, fake01))
    return {k: float(m[k]) for k in EVAL_KEYS if k in m}


# ------------------------------------------------------------------ phases
def phase_vae(args):
    import jax
    import numpy as np

    save = args.workdir / "vae"
    cfg = fixture_common(args, load_base("cifar10_vae"))
    cfg.update(epochs=args.vae_epochs, save_dir=str(save),
               sample_dir=str(save / "samples"),
               sample_interval=10**6, sample_start_epoch=10**6,
               save_interval=10**6, save_current_interval=args.vae_epochs,
               save_best=False, learning_rate=2e-4, ema_decay=0.995)
    ckpt = save / "current_model.ckpt"
    if not ckpt.exists():
        run([REPO / "train.py", "--config", write_cfg(args, "vae_cfg", cfg)],
            timeout=7200, retries=1)

    # reconstruction row: encode->decode the fixture set (posterior mode)
    from diffusion_models_collection_tpu.utils.latent import LatentCodec

    codec = LatentCodec(str(ckpt), scale_factor=1.0)
    real01 = real_images(args)
    x = jax.numpy.asarray(real01 * 2.0 - 1.0)
    recon = []
    for i in range(0, len(x), 50):
        z = codec.encode_mode(x[i:i + 50])
        recon.append(np.asarray(codec.decode(z)))
    recon01 = np.clip((np.concatenate(recon) + 1.0) / 2.0, 0.0, 1.0)

    # visual evidence: rows alternate real / its reconstruction
    from diffusion_models_collection_tpu.utils.helpers import save_image_grid

    pairs = np.concatenate([real01[:8], recon01[:8],
                            real01[8:16], recon01[8:16]])
    save_image_grid(pairs, ASSETS / "vae_recon_pairs.png", nrow=8)
    return [("VAE reconstruction (encode→decode, quality ceiling)",
             rel_metrics(real01, recon01))]


def phase_latent(args):
    vae_ckpt = args.workdir / "vae" / "current_model.ckpt"
    if not vae_ckpt.exists():
        raise SystemExit("latent phase needs the vae phase first")

    save = args.workdir / "latent"
    cfg = fixture_common(args, load_base("cifar10_latent_unet"))
    cfg.update(vae_checkpoint=str(vae_ckpt))

    # LDM sigma normalization, measured on the actual fixture latents
    from tools.compute_latent_scale import compute_scale

    stats = compute_scale(dict(cfg), batches=4)
    cfg["latent_scale_factor"] = float(stats["latent_scale_factor"])
    print(f"latent std {stats['latent_std']:.4f} -> scale "
          f"{cfg['latent_scale_factor']:.4f}")

    # T=200 fixture schedule with beta_end scaled x5 so alpha_bar_T ~ 0
    # (see tools/fixture_quality_run.py: unscaled betas leave 36% signal
    # at the terminal step and samples never fully denoise)
    cfg.update(epochs=args.latent_epochs, num_timesteps=200, beta_end=0.1,
               save_dir=str(save), sample_dir=str(save / "samples"),
               sample_interval=10**6, sample_start_epoch=10**6,
               save_interval=args.latent_epochs // 2,
               save_current_interval=args.latent_epochs, save_best=False,
               learning_rate=2e-4, ema_decay=0.995)
    ckpt = save / "current_model.ckpt"
    if not ckpt.exists():
        run([REPO / "train.py", "--config",
             write_cfg(args, "latent_cfg", cfg)],
            timeout=7200, retries=1)

    rows = []
    for tag, ckpt_path in (
        (f"latent UNet ddim-50 @epoch{args.latent_epochs // 2}",
         save / f"model_epoch_{args.latent_epochs // 2:04d}.ckpt"),
        (f"latent UNet ddim-50 @epoch{args.latent_epochs}", ckpt),
    ):
        if not ckpt_path.exists():
            continue
        out_json = args.workdir / f"metrics_{ckpt_path.stem}.json"
        img_dir = args.workdir / f"images_{ckpt_path.stem}"
        if not out_json.exists():  # resumable across tunnel stalls
            run([REPO / "evaluate.py", "--checkpoint", ckpt_path,
                 "--sampling_method", "ddim", "--num_inference_steps", "50",
                 "--num_samples", str(args.eval_samples),
                 "--batch_size", str(args.eval_batch),
                 "--seed", str(args.seed), "--use_ema",
                 "--save_images_dir", img_dir, "--output", out_json])
        data = json.loads(out_json.read_text())
        rows.append((tag, {k: data[k] for k in EVAL_KEYS if k in data}))
        grid = img_dir / "generate_grid_1.png"
        if grid.exists():  # visual evidence next to the metric row
            import shutil

            shutil.copy(grid, ASSETS / f"latent_{ckpt_path.stem}.png")
    return rows


def phase_sr(args):
    import jax
    import numpy as np

    save = args.workdir / "sr"
    cfg = fixture_common(args, load_base("celeba64_sr_unet"))
    cfg["model_params"] = dict(
        cfg["model_params"], image_size=(32, 32),
        channel_mult=(1, 2, 2), attention_resolutions=(16, 8),
    )
    cfg.update(image_size=(32, 32), conditional=False, num_classes=0,
               num_timesteps=200, beta_end=0.1,  # terminal-SNR-scaled
               epochs=args.sr_epochs,
               save_dir=str(save), sample_dir=str(save / "samples"),
               sample_interval=10**6, sample_start_epoch=10**6,
               save_interval=10**6, save_current_interval=args.sr_epochs,
               save_best=False, learning_rate=2e-4, ema_decay=0.995,
               cache_decoded=False, fast_jpeg_decode=False)
    ckpt = save / "current_model.ckpt"
    if not ckpt.exists():
        run([REPO / "train.py", "--config", write_cfg(args, "sr_cfg", cfg)],
            timeout=7200, retries=1)

    # Super-resolve the area-downsampled fixtures and compare to the
    # true 32x32 originals (evaluate.py has no SR mode: the conditioning
    # pairing is the metric protocol itself).
    from diffusion_models_collection_tpu.diffusion import DDIM
    from diffusion_models_collection_tpu.factory import (
        eval_model_fn, load_model_for_inference,
    )
    from diffusion_models_collection_tpu.utils import sr as sr_lib
    from diffusion_models_collection_tpu.utils.checkpoint import (
        load_checkpoint,
    )

    payload = load_checkpoint(str(ckpt))
    ccfg = payload["config"]
    model, params = load_model_for_inference(payload, ccfg, use_ema=True)
    model_fn = eval_model_fn(model, params)
    spec = sr_lib.SRSpec.from_config(ccfg)
    d = DDIM(num_timesteps=int(ccfg["num_timesteps"]),
             num_inference_steps=50,
             beta_start=ccfg["beta_start"], beta_end=ccfg["beta_end"],
             beta_schedule=ccfg["beta_schedule"])

    real01 = real_images(args)
    hr = jax.numpy.asarray(real01 * 2.0 - 1.0)
    lr = sr_lib.downsample(hr, spec.factor)
    rng = jax.random.PRNGKey(args.seed)
    outs = []
    for i in range(0, len(real01), 50):
        rng, krc, krs = jax.random.split(rng, 3)
        cond = sr_lib.make_condition(spec, (32, 32),
                                     lr_images=lr[i:i + 50], rng=krc)
        wrapped = sr_lib.wrap_model_fn(model_fn, cond)
        out = d.sample(wrapped, (cond.shape[0], 32, 32, 3), krs)
        outs.append(np.asarray(out))
    sr01 = np.clip((np.concatenate(outs) + 1.0) / 2.0, 0.0, 1.0)
    up01 = np.clip(
        (np.asarray(sr_lib.upsample(lr, (32, 32))) + 1.0) / 2.0, 0.0, 1.0
    )

    # visual evidence: rows alternate true HR / bilinear / SR3 output
    from diffusion_models_collection_tpu.utils.helpers import save_image_grid

    triples = np.concatenate([real01[:8], up01[:8], sr01[:8],
                              real01[8:16], up01[8:16], sr01[8:16]])
    save_image_grid(triples, ASSETS / "sr_hr_bilinear_sr3.png", nrow=8)
    return [
        ("bilinear 16→32 upsample (baseline to beat)",
         rel_metrics(real01, up01)),
        ("SR3 16→32 ddim-50 (LR-conditioned)",
         rel_metrics(real01, sr01)),
    ]


# --------------------------------------------------------------------- doc
def fmt(v):
    return f"{v:.4g}" if isinstance(v, (int, float)) else str(v)


def write_doc(args):
    sections = {}
    for p in PHASES:
        j = ASSETS / f"rows_{p}.json"
        if j.exists():
            sections[p] = json.loads(j.read_text())
    lines = [
        "# Latent + SR pipeline quality — fixtures, in-env",
        "",
        "Produced by `tools/pipelines_quality_run.py` on the real TPU "
        "(v5e-1): the latent-diffusion and super-resolution pipelines' "
        "quality loops on the committed CIFAR fixtures, measured against "
        "the same 200 real images as `docs/fixture_quality_run.md` "
        f"(fixed seed {args.seed}). SWD is calibrated (weight-free); "
        "rel-FID/rel-KID are relative statistics. Lower is better. "
        "These rows pair with the speed rows in `docs/benchmarks.md` "
        "(latent+decode ~272 samples/s, SR cascade ~14.8/s). "
        "Pixel-space comparator: the UNet fixture run's post-fix "
        "DDIM-50 rows (SWD×10³ 96.6 at the SWD-best epoch 1000, 130.9 "
        "at epoch 3000 — docs/fixture_quality_run.md).",
        "",
        "| pipeline row | rel-FID | rel-KID×10³ | SWD×10³ |",
        "|---|---|---|---|",
    ]
    for p in PHASES:
        for label, m in sections.get(p, []):
            kid = m.get("KID_mean")
            lines.append(
                f"| {label} | {fmt(m.get('FID'))} | "
                f"{fmt(kid * 1e3) if kid is not None else '—'} | "
                f"{fmt(m.get('swd_avg', '—'))} |"
            )
    lines.append("")
    grids = [
        ("vae_recon_pairs.png",
         "VAE reconstruction pairs (rows alternate real / reconstruction)"),
        ("sr_hr_bilinear_sr3.png",
         "SR 16→32 (rows alternate true HR / bilinear baseline / SR3)"),
    ] + sorted(
        (g.name, f"latent UNet DDIM-50 samples ({g.stem.split('latent_')[-1]})")
        for g in ASSETS.glob("latent_*.png")
    )
    shown = [(n, cap) for n, cap in grids if (ASSETS / n).exists()]
    if shown:
        lines.append("## Grids")
        lines.append("")
        for name, cap in shown:
            lines.append(f"{cap}:")
            lines.append("")
            lines.append(f"![](assets/pipelines_quality/{name})")
            lines.append("")
    DOC.write_text("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default=",".join(PHASES))
    ap.add_argument("--workdir", default="/tmp/dmc_tpu_pipelines")
    ap.add_argument("--eval_samples", type=int, default=200)
    ap.add_argument("--eval_batch", type=int, default=50)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--vae_epochs", type=int, default=600)
    ap.add_argument("--latent_epochs", type=int, default=2000)
    ap.add_argument("--sr_epochs", type=int, default=1500)
    args = ap.parse_args()
    args.workdir = Path(args.workdir)
    args.workdir.mkdir(parents=True, exist_ok=True)
    ASSETS.mkdir(parents=True, exist_ok=True)
    sys.path.insert(0, str(REPO))

    wanted = [p.strip() for p in args.phases.split(",") if p.strip()]
    bad = set(wanted) - set(PHASES)
    if bad:
        raise SystemExit(f"unknown phases: {sorted(bad)}")
    for p in wanted:
        rows = globals()[f"phase_{p}"](args)
        (ASSETS / f"rows_{p}.json").write_text(json.dumps(rows, indent=2))
        for label, m in rows:
            print(f"{label}: " + ", ".join(
                f"{k}={fmt(v)}" for k, v in m.items()))
        write_doc(args)
    print(json.dumps({"doc": str(DOC), "phases": wanted}))


if __name__ == "__main__":
    main()

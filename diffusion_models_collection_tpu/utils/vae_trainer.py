"""VAE training runtime for the latent-diffusion pipeline (extension —
the reference has no autoencoder stage; its trainer is diffusion-only,
reference utils/trainer.py:21-421).

Stage 1 of latent diffusion (Rombach et al. 2022): train the KL-VAE on
images alone, then freeze it and train the denoiser in its latent space
(`latent_diffusion: true` — utils/latent.py). Mirrors DiffusionTrainer's
TPU-native shape: ONE jitted donated train step (reparameterized forward,
recon + KL loss, backward, clip, optimizer, EMA lerp), GSPMD data
parallelism over the 'data' mesh axis, the same checkpoint schema/file
rotation so `load_checkpoint`/torch tooling work unchanged.
"""

from __future__ import annotations

import math
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.vae import kl_divergence
from ..parallel import mesh as pmesh
from . import checkpoint as ckpt_lib
from .ema import ema_update
from .helpers import count_parameters, resolve_image_size, save_image_grid
from .profiler import StepTimer
from .tracker import NullTracker, Tracker, build_tracker
from .trainer import TrainState, build_optimizer


def init_vae_params(model, rng):
    """One jitted host-CPU init (same rationale as factory.init_model_params:
    eager init dispatches hundreds of tiny ops — catastrophic on a
    remote-compiled backend)."""
    h, w = model.image_size
    lh, lw = model.latent_hw()
    x = jnp.zeros((1, h, w, model.in_channels), jnp.float32)
    noise = jnp.zeros((1, lh, lw, model.latent_channels), jnp.float32)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None

    def do(k):
        return model.init(k, x, noise)

    if cpu is None:
        variables = jax.jit(do)(rng)
    else:
        with jax.default_device(cpu):
            variables = jax.jit(do)(rng)
    return variables["params"]


class VAETrainer:
    """Trainer for the `model_type: 'vae'` stage.

    Config keys beyond the shared trainer set: `kl_weight` (default 1e-4
    — the per-element KL coefficient; LDM trains its KL autoencoders with
    a very small weight so latents stay information-rich).
    """

    def __init__(
        self,
        model,
        train_loader,
        config: Optional[dict] = None,
        rng: Optional[jax.Array] = None,
        resume_path: Optional[str] = None,
        tracker: Optional[Tracker] = None,
    ):
        self.model = model
        self.train_loader = train_loader
        self.config = config or {}
        cfg = self.config

        self.epochs = cfg.get("epochs", 100)
        self.save_dir = Path(cfg.get("save_dir", "./checkpoints"))
        self.sample_dir = Path(cfg.get("sample_dir", "./generated_images"))
        self.save_interval = cfg.get("save_interval", 10)
        self.sample_interval = cfg.get("sample_interval", 5)
        self.sample_start_epoch = cfg.get("sample_start_epoch", 1)
        self.num_samples = cfg.get("num_samples", 8)
        self.kl_weight = float(cfg.get("kl_weight", 1e-4))
        self.use_ema = cfg.get("use_ema", False)
        self.ema_decay = cfg.get("ema_decay", 0.9999)
        self.image_size = resolve_image_size(cfg.get("image_size", 32))

        self.mesh = pmesh.data_parallel_mesh()
        self.is_main_process = pmesh.process_index() == 0
        self.world_size = self.mesh.devices.size
        if self.is_main_process:
            self.save_dir.mkdir(parents=True, exist_ok=True)
            self.sample_dir.mkdir(parents=True, exist_ok=True)

        self.rng = rng if rng is not None else jax.random.PRNGKey(
            cfg.get("seed", 42)
        )
        self.rng, init_rng = jax.random.split(self.rng)
        self.params = init_vae_params(model, init_rng)
        if self.is_main_process:
            print(f"VAE parameters: {count_parameters(self.params):,}")

        num_batches = max(1, len(train_loader))
        self.accum = int(cfg.get("gradient_accumulation_steps", 1))
        optimizer, self.lr_schedule, self.accum = build_optimizer(
            cfg, max(1, num_batches // self.accum)
        )
        self.optimizer = optimizer
        opt_state = optimizer.init(self.params)
        ema_params = (
            jax.tree_util.tree_map(jnp.copy, self.params)
            if self.use_ema else None
        )
        self.state = pmesh.replicate(
            self.mesh,
            TrainState(params=self.params, opt_state=opt_state,
                       ema_params=ema_params),
        )

        self.best_loss = float("inf")
        self.start_epoch = 1
        self.global_step = 0
        self._train_step = self._build_train_step()

        if resume_path:
            self.load_checkpoint(resume_path)

        if tracker is not None:
            self.tracker = tracker
        elif self.is_main_process:
            self.tracker = build_tracker(cfg, str(self.save_dir))
        else:
            self.tracker = NullTracker()
        self.step_timer = StepTimer()

    # ---------------------------------------------------------------- step
    def _build_train_step(self):
        model = self.model
        optimizer = self.optimizer
        kl_weight = self.kl_weight
        use_ema = self.use_ema
        ema_decay = float(self.ema_decay)
        is_multisteps = isinstance(optimizer, optax.MultiSteps)
        lh, lw = model.latent_hw()
        lc = model.latent_channels

        def train_step(state: TrainState, images, rng):
            z_rng, dropout_rng = jax.random.split(rng)
            noise = jax.random.normal(
                z_rng, (images.shape[0], lh, lw, lc), jnp.float32
            )

            def loss_fn(params):
                recon, mean, logvar = model.apply(
                    {"params": params}, images, noise, train=True,
                    rngs={"dropout": dropout_rng},
                )
                rec = jnp.mean((recon - images) ** 2)
                kl = kl_divergence(mean, logvar)
                return rec + kl_weight * kl, (rec, kl)

            (loss, (rec, kl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            new_ema = state.ema_params
            if use_ema:
                lerped = ema_update(state.ema_params, new_params, ema_decay)
                if is_multisteps:
                    applied = optimizer.has_updated(new_opt_state)
                    new_ema = jax.tree_util.tree_map(
                        lambda e_new, e_old: jnp.where(applied, e_new, e_old),
                        lerped, state.ema_params,
                    )
                else:
                    new_ema = lerped
            return (
                TrainState(params=new_params, opt_state=new_opt_state,
                           ema_params=new_ema),
                loss, rec, kl,
            )

        return jax.jit(train_step, donate_argnums=(0,))

    # --------------------------------------------------------------- epoch
    def train_epoch(self, epoch: int):
        if hasattr(self.train_loader, "set_epoch"):
            self.train_loader.set_epoch(epoch)
        losses, recs, kls = [], [], []
        for images, _ in self.train_loader:
            with self.step_timer.step():
                batch = pmesh.local_batch_to_global(
                    self.mesh, (np.asarray(images, dtype=np.float32),)
                )[0]
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, loss, rec, kl = self._train_step(
                    self.state, batch, step_rng
                )
                losses.append(loss)
                recs.append(rec)
                kls.append(kl)
                self.global_step += 1
        if not losses:
            return float("nan"), float("nan"), float("nan")
        return (
            float(jnp.mean(jnp.stack(losses))),
            float(jnp.mean(jnp.stack(recs))),
            float(jnp.mean(jnp.stack(kls))),
        )

    # ---------------------------------------------------------- evaluation
    def _infer_params(self):
        if self.use_ema and self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params

    def reconstruction_grid(self, epoch: int, images) -> np.ndarray:
        """Save an [originals; posterior-mode reconstructions] grid."""
        images = jnp.asarray(np.asarray(images[: self.num_samples]),
                             jnp.float32)
        params = self._infer_params()
        mean, _ = self.model.apply(
            {"params": params}, images, method=self.model.encode
        )
        recon = self.model.apply(
            {"params": params}, mean, method=self.model.decode
        )
        grid = np.clip(
            (np.concatenate([np.asarray(images), np.asarray(recon)]) + 1) / 2,
            0, 1,
        )
        if self.is_main_process:
            path = self.sample_dir / f"vae_epoch_{epoch:04d}.png"
            save_image_grid(grid, path, nrow=len(images))
            self.tracker.log_image("vae_recon", str(path), step=epoch)
        return grid

    # ---------------------------------------------------------- checkpoints
    def save_checkpoint(self, epoch: int, is_best: bool = False,
                        is_last: bool = False):
        """Same schema + rotation contract as DiffusionTrainer
        (trainer.py:328-365) so checkpoint tooling works unchanged —
        including its IO gates: `save_current_interval` rate-limits the
        per-epoch current_model.ckpt write and `save_best` can disable
        the best file (each write is a full host gather + pickle; at
        fixture scale ungated writes made the 0.17 s VAE epoch take
        ~13 s of wall time — the same bug class as the iCT one). The
        final epoch always writes current_model.ckpt."""
        if not self.is_main_process:
            return
        save_current_every = int(
            self.config.get("save_current_interval", 1) or 1
        )
        write_current = is_last or epoch % save_current_every == 0
        write_best = is_best and bool(self.config.get("save_best", True))
        write_periodic = epoch % self.save_interval == 0
        if not (write_current or write_best or write_periodic):
            return

        def write(path):
            ckpt_lib.save_checkpoint(
                path,
                epoch=epoch,
                params=self.state.params,
                opt_state=self.state.opt_state,
                best_loss=self.best_loss,
                config=self.config,
                ema_params=self.state.ema_params,
                extra={"global_step": self.global_step},
                format=self.config.get("checkpoint_format", "pickle"),
            )

        if write_current:
            write(self.save_dir / "current_model.ckpt")
        if write_best:
            write(self.save_dir / "best_model.ckpt")
        if write_periodic:
            write(self.save_dir / f"model_epoch_{epoch:04d}.ckpt")

    def load_checkpoint(self, checkpoint_path):
        print(f"Loading VAE checkpoint from {checkpoint_path}...")
        payload = ckpt_lib.load_checkpoint(checkpoint_path)
        params = payload["model_state_dict"]
        opt_state = payload.get("optimizer_state_dict",
                                self.state.opt_state)
        ema = payload.get("ema_model_state_dict")
        if ema is None and self.use_ema:
            ema = jax.tree_util.tree_map(np.copy, params)
        self.state = pmesh.replicate(
            self.mesh,
            TrainState(params=params, opt_state=opt_state,
                       ema_params=ema if self.use_ema else None),
        )
        self.start_epoch = payload.get("epoch", 0) + 1
        self.best_loss = payload.get("best_loss", float("inf"))
        self.global_step = payload.get("global_step", 0)
        print(f"Resuming VAE training from epoch {self.start_epoch}")

    # ----------------------------------------------------------------- loop
    def train(self):
        if self.is_main_process:
            print(f"Starting VAE training for {self.epochs} epochs")
            print(f"Mesh: {self.mesh} ({self.world_size} devices)")
        last_batch = None
        for epoch in range(self.start_epoch, self.epochs + 1):
            start_time = time.time()
            avg_loss, avg_rec, avg_kl = self.train_epoch(epoch)
            epoch_time = time.time() - start_time
            if not math.isfinite(avg_loss):
                print(
                    f"ERROR: non-finite VAE loss ({avg_loss}) at epoch "
                    f"{epoch}; stopping before overwriting checkpoints."
                )
                self.tracker.log({"train/diverged_epoch": epoch}, step=epoch)
                break
            if self.is_main_process:
                print(
                    f"Epoch {epoch}/{self.epochs} - Loss: {avg_loss:.4f} "
                    f"(recon {avg_rec:.4f}, kl {avg_kl:.4f}) - "
                    f"Time: {epoch_time:.2f}s"
                )
                self.tracker.log(
                    {
                        "train/loss": avg_loss,
                        "train/recon_loss": avg_rec,
                        "train/kl": avg_kl,
                        "train/epoch_time": epoch_time,
                    },
                    step=epoch,
                )
            is_best = avg_loss < self.best_loss
            if is_best:
                self.best_loss = avg_loss
            self.save_checkpoint(epoch, is_best,
                                 is_last=epoch == self.epochs)
            if (
                epoch >= self.sample_start_epoch
                and epoch % self.sample_interval == 0
            ):
                if last_batch is None:
                    for images, _ in self.train_loader:
                        last_batch = images
                        break
                if last_batch is not None:
                    self.reconstruction_grid(epoch, last_batch)
        if self.is_main_process:
            print("Training completed!")
            self.tracker.finish()

    def cleanup(self):
        pass

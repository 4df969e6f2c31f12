"""Noise-conditional classifier training for classifier guidance
(extension — Dhariwal & Nichol 2021; the reference has no classifier).

`model_type: 'classifier'` in a standard training config routes train.py
here: each batch is forward-noised to a uniformly-sampled timestep with
the SAME q_sample / schedule the diffusion models use (the classifier
must see exactly the marginals it will guide through), then trained with
cross-entropy on the true labels (raw 0..K-1 — no CFG-null shift). Same
TPU-native shape as the other trainers: ONE jitted donated step (noising
+ forward + CE + backward + clip + optimizer + EMA lerp), GSPMD data
parallelism, the standard checkpoint schema so sample.py's
--classifier_checkpoint loads the output directly.
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

from ..diffusion import base as diff_base
from ..diffusion.schedule import NoiseSchedule
from ..parallel import mesh as pmesh
from . import checkpoint as ckpt_lib
from .ema import ema_update
from .helpers import count_parameters, resolve_image_size
from .profiler import StepTimer
from .tracker import NullTracker, Tracker, build_tracker
from .trainer import TrainState, build_optimizer


class ClassifierTrainer:
    """Trainer for `model_type: 'classifier'` configs.

    Shares the diffusion config's schedule keys (`num_timesteps`,
    `beta_start/end/schedule`, `zero_terminal_snr`) — train the
    classifier with the SAME values as the diffusion model it will guide.
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

        if not cfg.get("conditional", False):
            raise ValueError(
                "classifier training needs a labeled dataset "
                "(conditional: true)"
            )
        if cfg.get("super_resolution"):
            raise ValueError(
                "super_resolution does not apply to classifier training"
            )
        if cfg.get("latent_diffusion"):
            raise ValueError(
                "classifier guidance is defined on pixels; train the "
                "classifier on the pixel dataset (no latent_diffusion)"
            )
        self.num_classes = int(cfg.get("num_classes", 0) or 0)
        if self.num_classes < 2:
            raise ValueError("classifier training needs num_classes >= 2")

        self.epochs = cfg.get("epochs", 100)
        self.save_dir = Path(cfg.get("save_dir", "./checkpoints"))
        self.save_interval = cfg.get("save_interval", 10)
        self.use_ema = cfg.get("use_ema", False)
        self.ema_decay = cfg.get("ema_decay", 0.9999)
        self.image_size = resolve_image_size(cfg.get("image_size", 32))
        self.num_timesteps = int(cfg.get("num_timesteps", 1000))
        self.schedule = NoiseSchedule.create(
            self.num_timesteps,
            cfg.get("beta_start", 1e-4),
            cfg.get("beta_end", 0.02),
            cfg.get("beta_schedule", "linear"),
            zero_terminal_snr=bool(cfg.get("zero_terminal_snr", False)),
        )

        self.mesh = pmesh.data_parallel_mesh()
        self.is_main_process = pmesh.process_index() == 0
        self.world_size = self.mesh.devices.size
        if self.is_main_process:
            self.save_dir.mkdir(parents=True, exist_ok=True)

        self.rng = rng if rng is not None else jax.random.PRNGKey(
            cfg.get("seed", 42)
        )
        self.rng, init_rng = jax.random.split(self.rng)
        from ..factory import init_model_params

        self.params = init_model_params(
            model, init_rng, self.image_size,
            cfg.get("model_params", {}).get("in_channels", 3),
            conditional=False,  # the classifier takes no label INPUT
        )
        if self.is_main_process:
            print(f"Classifier parameters: {count_parameters(self.params):,}")

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
        schedule = self.schedule
        num_timesteps = self.num_timesteps
        use_ema = self.use_ema
        ema_decay = float(self.ema_decay)
        is_multisteps = isinstance(optimizer, optax.MultiSteps)

        def train_step(state: TrainState, images, labels, rng):
            t_rng, noise_rng, dropout_rng = jax.random.split(rng, 3)
            batch = images.shape[0]
            t = jax.random.randint(t_rng, (batch,), 0, num_timesteps)
            noise = jax.random.normal(noise_rng, images.shape, images.dtype)
            x_t = diff_base.q_sample(schedule, images, t, noise)
            y = labels.astype(jnp.int32)  # raw 0..K-1, no null shift

            def loss_fn(params):
                logits = model.apply(
                    {"params": params}, x_t, t, train=True,
                    rngs={"dropout": dropout_rng},
                )
                logp = jax.nn.log_softmax(logits, axis=-1)
                ce = -jnp.mean(
                    jnp.take_along_axis(logp, y[:, None], axis=-1)
                )
                acc = jnp.mean(
                    (jnp.argmax(logits, axis=-1) == y).astype(jnp.float32)
                )
                return ce, acc

            (loss, acc), grads = jax.value_and_grad(
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
                        lambda e_new, e_old: jnp.where(applied, e_new,
                                                       e_old),
                        lerped, state.ema_params,
                    )
                else:
                    new_ema = lerped
            return (
                TrainState(params=new_params, opt_state=new_opt_state,
                           ema_params=new_ema),
                loss, acc,
            )

        return jax.jit(train_step, donate_argnums=(0,))

    # --------------------------------------------------------------- epoch
    def train_epoch(self, epoch: int):
        if hasattr(self.train_loader, "set_epoch"):
            self.train_loader.set_epoch(epoch)
        losses, accs = [], []
        for images, labels in self.train_loader:
            if labels is None:
                raise ValueError(
                    "classifier training requires labeled batches"
                )
            with self.step_timer.step():
                batch = pmesh.local_batch_to_global(
                    self.mesh,
                    (np.asarray(images, dtype=np.float32),
                     np.asarray(labels, dtype=np.int32)),
                )
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, loss, acc = self._train_step(
                    self.state, batch[0], batch[1], step_rng
                )
                losses.append(loss)
                accs.append(acc)
                self.global_step += 1
        if not losses:
            return float("nan"), float("nan")
        return (
            float(jnp.mean(jnp.stack(losses))),
            float(jnp.mean(jnp.stack(accs))),
        )

    # ---------------------------------------------------------- checkpoints
    def save_checkpoint(self, epoch: int, is_best: bool = False):
        """Standard schema/rotation (trainer.py:328-365) so sample.py's
        --classifier_checkpoint loads the file directly."""
        if not self.is_main_process:
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

        write(self.save_dir / "current_model.ckpt")
        if is_best:
            write(self.save_dir / "best_model.ckpt")
        if epoch % self.save_interval == 0:
            write(self.save_dir / f"model_epoch_{epoch:04d}.ckpt")

    def load_checkpoint(self, checkpoint_path):
        print(f"Loading classifier checkpoint from {checkpoint_path}...")
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
        print(f"Resuming classifier training from epoch {self.start_epoch}")

    # ----------------------------------------------------------------- loop
    def train(self):
        if self.is_main_process:
            print(f"Starting classifier training for {self.epochs} epochs")
            print(f"Mesh: {self.mesh} ({self.world_size} devices)")
        for epoch in range(self.start_epoch, self.epochs + 1):
            start_time = time.time()
            avg_loss, avg_acc = self.train_epoch(epoch)
            epoch_time = time.time() - start_time
            if not math.isfinite(avg_loss):
                print(
                    f"ERROR: non-finite classifier loss ({avg_loss}) at "
                    f"epoch {epoch}; stopping before overwriting "
                    "checkpoints."
                )
                self.tracker.log({"train/diverged_epoch": epoch},
                                 step=epoch)
                break
            if self.is_main_process:
                print(
                    f"Epoch {epoch}/{self.epochs} - CE: {avg_loss:.4f} - "
                    f"Acc: {avg_acc:.3f} - Time: {epoch_time:.2f}s"
                )
                self.tracker.log(
                    {
                        "train/loss": avg_loss,
                        "train/accuracy": avg_acc,
                        "train/epoch_time": epoch_time,
                    },
                    step=epoch,
                )
            is_best = avg_loss < self.best_loss
            if is_best:
                self.best_loss = avg_loss
            self.save_checkpoint(epoch, is_best=is_best)
        if self.is_main_process:
            print("Training completed!")

    def cleanup(self):
        if self.is_main_process:
            self.tracker.finish()

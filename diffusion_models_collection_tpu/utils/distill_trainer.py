"""Progressive-distillation runtime (Salimans & Ho 2022) — extension
beyond the reference (whose trainer only fits the base denoiser).

Stage loop: start from a trained VP checkpoint (DDPM/DDIM family — the
teacher), teach a student (initialized FROM the teacher) to match two
teacher DDIM steps with one of its own on an N-step grid, then promote
the student to teacher and halve N. Each stage writes a standard-schema
checkpoint whose embedded config carries `num_inference_steps: N`, so
`sample.py --sampling_method ddim` uses the distilled model unchanged.

TPU-native: ONE jitted donated step per stage — forward-noise a data
batch onto a random grid point, run BOTH teacher forwards and the
student forward/backward fused (teacher params as frozen jit-closure
constants), truncated-SNR x0-space loss (diffusion/distill.py), optional
EMA. Data parallel over the 'data' mesh via GSPMD like the main trainer.
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

from ..diffusion import base as dbase
from ..diffusion.distill import (
    distill_grids,
    student_distill_loss,
    two_step_teacher_target,
)
from ..parallel import mesh as pmesh
from . import checkpoint as ckpt_lib
from .ema import gated_ema_update
from .helpers import count_parameters, resolve_image_size
from .profiler import StepTimer
from .tracker import NullTracker, Tracker, build_tracker
from .trainer import TrainState, build_optimizer


class DistillationTrainer:
    """Distills a trained VP diffusion checkpoint down to few-step DDIM.

    Config keys beyond the shared trainer set:
      teacher_checkpoint : the stage-0 teacher (.ckpt/.pth)
      distill_steps      : the FIRST student's step count N (default 8)
      distill_stages     : number of halvings (default 1; stage k trains
                           an N/2^k-step student)
      epochs             : epochs per stage
    """

    def __init__(
        self,
        train_loader,
        config: dict,
        rng: Optional[jax.Array] = None,
        tracker: Optional[Tracker] = None,
    ):
        from ..factory import get_diffusion, get_model

        self.config = config
        cfg = config
        payload = ckpt_lib.load_checkpoint(cfg["teacher_checkpoint"])
        t_cfg = dict(payload.get("config") or {})
        if not t_cfg:
            raise ValueError("teacher checkpoint has no embedded config")
        dtype_key = str(t_cfg.get("diffusion_type", "ddpm")).lower()
        if dtype_key not in ("ddpm", "diffusion"):
            raise ValueError(
                "progressive distillation operates on the VP (DDPM/DDIM) "
                f"family; teacher has diffusion_type={dtype_key!r}"
            )
        if t_cfg.get("super_resolution"):
            raise ValueError(
                "progressive distillation does not support "
                "super-resolution teachers (the student would need the "
                "LR conditioning threaded through every pair)"
            )
        self.teacher_config = t_cfg
        self.model = get_model(t_cfg)
        self.diffusion = get_diffusion(t_cfg)  # schedule + prediction_type
        teacher_params = payload.get("ema_model_state_dict")
        if teacher_params is None:
            teacher_params = payload["model_state_dict"]
        self.teacher_params = jax.tree_util.tree_map(
            jnp.asarray, teacher_params
        )

        self.train_loader = train_loader
        self.steps0 = int(cfg.get("distill_steps", 8))
        self.stages = int(cfg.get("distill_stages", 1))
        if self.steps0 < 2 or self.steps0 % 2:
            raise ValueError("distill_steps must be an even integer >= 2")
        if self.stages < 1 or self.steps0 % (2 ** (self.stages - 1)):
            raise ValueError(
                f"distill_steps={self.steps0} cannot halve "
                f"{self.stages - 1} times"
            )
        self.epochs = int(cfg.get("epochs", 1))
        self.save_dir = Path(cfg.get("save_dir", "./checkpoints"))
        self.use_ema = bool(cfg.get("use_ema", True))
        self.ema_decay = float(cfg.get("ema_decay", 0.999))
        self.conditional = bool(t_cfg.get("conditional", False))
        self.num_classes = t_cfg.get("num_classes")
        self.cfg_dropout_prob = float(cfg.get(
            "cfg_dropout_prob", t_cfg.get("cfg_dropout_prob", 0.0)
        ))
        self.image_size = resolve_image_size(t_cfg["image_size"])

        self.mesh = pmesh.data_parallel_mesh()
        self.is_main_process = pmesh.process_index() == 0
        if self.is_main_process:
            self.save_dir.mkdir(parents=True, exist_ok=True)
            print(
                f"Distilling {cfg['teacher_checkpoint']} "
                f"({count_parameters(self.teacher_params):,} params): "
                f"{self.steps0} steps, {self.stages} stage(s)"
            )
        self.rng = rng if rng is not None else jax.random.PRNGKey(
            cfg.get("seed", 42)
        )
        if tracker is not None:
            self.tracker = tracker
        elif self.is_main_process:
            self.tracker = build_tracker(cfg, str(self.save_dir))
        else:
            self.tracker = NullTracker()
        self.step_timer = StepTimer()

    # ---------------------------------------------------------------- step
    def _build_step(self, teacher_params, grids):
        model = self.model
        diffusion = self.diffusion
        schedule = diffusion.schedule
        prediction_type = diffusion.prediction_type
        optimizer = self.optimizer
        conditional = self.conditional
        cfg_dropout = self.cfg_dropout_prob
        num_classes = self.num_classes
        use_ema = self.use_ema
        ema_decay = self.ema_decay
        t_arr, t_mid_arr, t_next_arr = grids
        n_grid = int(t_arr.shape[0])

        def teacher_fn(x, t, y=None):
            return model.apply(
                {"params": teacher_params}, x, t, y, train=False
            )

        teacher_pair = dbase.wrap_model_as_eps_x0(
            schedule, teacher_fn, prediction_type
        )

        def train_step(state: TrainState, images, labels, rng):
            i_rng, noise_rng, drop_rng, dropout_rng = jax.random.split(rng, 4)
            batch = images.shape[0]
            idx = jax.random.randint(i_rng, (batch,), 0, n_grid)
            t = t_arr[idx]
            t_mid = t_mid_arr[idx]
            t_next = t_next_arr[idx]
            noise = jax.random.normal(noise_rng, images.shape, images.dtype)
            z = dbase.q_sample(schedule, images, t, noise)

            if conditional:
                y = labels.astype(jnp.int32) + 1
                if cfg_dropout > 0 and num_classes is not None:
                    drop = jax.random.uniform(drop_rng, (batch,)) < cfg_dropout
                    y = jnp.where(drop, 0, y)
            else:
                y = None

            # teacher target: two DDIM steps, fused into this program;
            # stop_gradient so the student never differentiates through it
            x0_target = jax.lax.stop_gradient(
                two_step_teacher_target(
                    schedule, teacher_pair, z, t, t_mid, t_next, y
                )
            )

            def loss_fn(params):
                def student_fn(x, tt, yy=None):
                    return model.apply(
                        {"params": params}, x, tt, yy, train=True,
                        rngs={"dropout": dropout_rng},
                    )

                student_pair = dbase.wrap_model_as_eps_x0(
                    schedule, student_fn, prediction_type
                )
                return student_distill_loss(
                    schedule, student_pair, x0_target, z, t, y
                )

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            new_ema = state.ema_params
            if use_ema:
                new_ema = gated_ema_update(
                    optimizer, new_opt_state,
                    state.ema_params, new_params, ema_decay,
                )
            return (
                TrainState(params=new_params, opt_state=new_opt_state,
                           ema_params=new_ema),
                loss,
            )

        return jax.jit(train_step, donate_argnums=(0,))

    # --------------------------------------------------------------- stages
    def _stage_checkpoint(self, epoch, steps, state, best_loss):
        """Standard-schema checkpoint; the embedded config samples this
        student directly (`--sampling_method ddim` at `steps` steps)."""
        if not self.is_main_process:
            return
        out_cfg = dict(self.teacher_config)
        out_cfg["num_inference_steps"] = int(steps)
        out_cfg["distilled_steps"] = int(steps)

        def write(path):
            ckpt_lib.save_checkpoint(
                path,
                epoch=epoch,
                params=state.params,
                opt_state=state.opt_state,
                best_loss=best_loss,
                config=out_cfg,
                ema_params=state.ema_params,
                format=self.config.get("checkpoint_format", "pickle"),
            )

        write(self.save_dir / f"distilled_{steps:04d}step.ckpt")
        write(self.save_dir / "current_model.ckpt")

    def distill(self):
        """Run all stages; returns the final student params."""
        steps = self.steps0
        teacher_params = self.teacher_params
        for stage in range(self.stages):
            grids = distill_grids(self.diffusion.num_timesteps, steps)
            num_batches = max(1, len(self.train_loader))
            # LR horizon counts real optimizer updates, not micro-steps
            accum = int(self.config.get("gradient_accumulation_steps", 1))
            self.optimizer, self.lr_schedule, _ = build_optimizer(
                self.config, max(1, num_batches // accum)
            )
            student = jax.tree_util.tree_map(jnp.copy, teacher_params)
            state = pmesh.replicate(
                self.mesh,
                TrainState(
                    params=student,
                    opt_state=self.optimizer.init(student),
                    ema_params=(
                        jax.tree_util.tree_map(jnp.copy, student)
                        if self.use_ema else None
                    ),
                ),
            )
            step_fn = self._build_step(teacher_params, grids)
            best = float("inf")
            for epoch in range(1, self.epochs + 1):
                if hasattr(self.train_loader, "set_epoch"):
                    self.train_loader.set_epoch(epoch)
                t0 = time.time()
                losses = []
                for images, labels in self.train_loader:
                    with self.step_timer.step():
                        batch = pmesh.local_batch_to_global(
                            self.mesh,
                            (
                                np.asarray(images, np.float32),
                                np.asarray(
                                    labels if labels is not None
                                    else np.zeros(len(images)),
                                    np.int32,
                                ),
                            ),
                        )
                        self.rng, step_rng = jax.random.split(self.rng)
                        state, loss = step_fn(
                            state, batch[0], batch[1], step_rng
                        )
                        losses.append(loss)
                avg = float(jnp.mean(jnp.stack(losses))) if losses else (
                    float("nan")
                )
                if not math.isfinite(avg):
                    raise RuntimeError(
                        f"non-finite distillation loss at stage {stage} "
                        f"epoch {epoch}"
                    )
                best = min(best, avg)
                if self.is_main_process:
                    print(
                        f"[stage {stage + 1}/{self.stages}, {steps} steps] "
                        f"epoch {epoch}/{self.epochs} - loss {avg:.5f} - "
                        f"{time.time() - t0:.1f}s"
                    )
                    self.tracker.log(
                        {f"distill/{steps}step/loss": avg}, step=epoch
                    )
            self._stage_checkpoint(self.epochs, steps, state, best)
            # promote: the (EMA) student becomes the next teacher
            teacher_params = (
                state.ema_params if self.use_ema else state.params
            )
            teacher_params = jax.tree_util.tree_map(
                jnp.asarray, teacher_params
            )
            steps //= 2
        if self.is_main_process:
            print("Distillation completed!")
            self.tracker.finish()
        return teacher_params

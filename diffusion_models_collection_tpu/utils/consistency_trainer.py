"""Consistency-distillation runtime (Song et al. 2023 Alg. 2) —
extension beyond the reference (whose trainer only fits the base
denoiser, reference utils/trainer.py:21).

Distills a trained VP (DDPM/DDIM-family) checkpoint into a consistency
model that samples in 1-4 steps (`diffusion/consistency.py`). One
stage: sample adjacent times on an N-point DDIM grid, take one frozen
teacher DDIM step, and pull the student's consistency output at t
toward the EMA target network's output at t_next.

TPU-native, same shape as the other trainers here: ONE jitted donated
step fusing the teacher forward (frozen jit-closure constants), the
student forward/backward, the optimizer, and the target-EMA update; the
grid rides as closure constants; data parallel over the 'data' mesh via
GSPMD.

Checkpoints use the standard schema with `diffusion_type:
'consistency'` embedded, so the ordinary CLIs sample them directly:

    python sample.py --checkpoint <save_dir>/consistency_model.ckpt \
        --num_inference_steps 2 --use_ema ...

(--use_ema selects the target network theta^-, the paper's sampling
choice; without it the online student samples.)
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
from ..diffusion.consistency import (
    cd_grids,
    consistency_distill_loss,
    consistency_training_loss,
)
from ..diffusion.schedule import NoiseSchedule
from ..parallel import mesh as pmesh
from . import checkpoint as ckpt_lib
from .ema import gated_ema_update
from .helpers import count_parameters, resolve_image_size
from .profiler import StepTimer
from .tracker import NullTracker, Tracker, build_tracker
from .trainer import TrainState, build_optimizer


class ConsistencyDistillationTrainer:
    """Distills a trained VP diffusion checkpoint into a consistency
    model (1-4 step sampling).

    Config keys beyond the shared trainer set:
      teacher_checkpoint     : the teacher (.ckpt/.pth)
      consistency_grid_size  : N grid points for (t, t_next) pairs
                               (default 50)
      distill_cfg_scale      : fixed guidance w baked into the teacher
                               step (guided distillation; default 0)
      sigma_data             : boundary-scaling constant (default 0.5)
      timestep_scaling       : t -> s divisor in the scalings (default 10)
      consistency_loss       : 'huber' (pseudo-Huber, default) | 'l2'
      huber_c                : pseudo-Huber constant (default 0.03)
      target_ema_decay       : theta^- decay (default 0.95)
      consistency_sample_steps : num_inference_steps embedded in the
                               output checkpoint (default 2)
      epochs                 : training epochs
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
                "consistency distillation operates on the VP (DDPM/DDIM) "
                f"family; teacher has diffusion_type={dtype_key!r}"
            )
        if t_cfg.get("super_resolution"):
            raise ValueError(
                "consistency distillation does not support "
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
        self.grid_size = int(cfg.get("consistency_grid_size", 50))
        self.distill_cfg_scale = float(cfg.get("distill_cfg_scale", 0.0))
        self.sigma_data = float(cfg.get("sigma_data", 0.5))
        self.timestep_scaling = float(cfg.get("timestep_scaling", 10.0))
        self.loss_type = str(cfg.get("consistency_loss", "huber"))
        self.huber_c = float(cfg.get("huber_c", 0.03))
        self.target_ema_decay = float(cfg.get("target_ema_decay", 0.95))
        self.sample_steps = int(cfg.get("consistency_sample_steps", 2))
        self.epochs = int(cfg.get("epochs", 1))
        self.save_dir = Path(cfg.get("save_dir", "./checkpoints"))
        self.conditional = bool(t_cfg.get("conditional", False))
        self.num_classes = t_cfg.get("num_classes")
        if self.distill_cfg_scale > 0.0 and not self.conditional:
            raise ValueError(
                "distill_cfg_scale needs a conditional teacher "
                "(guided distillation guides on class labels)"
            )
        self.cfg_dropout_prob = float(cfg.get(
            "cfg_dropout_prob", t_cfg.get("cfg_dropout_prob", 0.0)
        ))
        self.image_size = resolve_image_size(t_cfg["image_size"])

        self.mesh = pmesh.data_parallel_mesh()
        self.is_main_process = pmesh.process_index() == 0
        if self.is_main_process:
            self.save_dir.mkdir(parents=True, exist_ok=True)
            print(
                f"Consistency-distilling {cfg['teacher_checkpoint']} "
                f"({count_parameters(self.teacher_params):,} params): "
                f"grid {self.grid_size}, w={self.distill_cfg_scale}"
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
    def _build_step(self):
        model = self.model
        diffusion = self.diffusion
        schedule = diffusion.schedule
        prediction_type = diffusion.prediction_type
        optimizer = self.optimizer
        conditional = self.conditional
        cfg_dropout = self.cfg_dropout_prob
        num_classes = self.num_classes
        teacher_params = self.teacher_params
        sigma_data = self.sigma_data
        timestep_scaling = self.timestep_scaling
        distill_w = self.distill_cfg_scale
        loss_type = self.loss_type
        huber_c = self.huber_c
        target_decay = self.target_ema_decay
        t_arr, t_next_arr = cd_grids(
            diffusion.num_timesteps, self.grid_size
        )
        n_pairs = int(t_arr.shape[0])

        def teacher_fn(x, t, y=None):
            return model.apply(
                {"params": teacher_params}, x, t, y, train=False
            )

        teacher_pair = dbase.wrap_model_as_eps_x0(
            schedule, teacher_fn, prediction_type
        )

        def pair_of(params, dropout_rng=None):
            def fn(x, t, y=None):
                kwargs = {}
                if dropout_rng is not None:
                    kwargs = dict(train=True, rngs={"dropout": dropout_rng})
                else:
                    kwargs = dict(train=False)
                return model.apply({"params": params}, x, t, y, **kwargs)

            return dbase.wrap_model_as_eps_x0(schedule, fn, prediction_type)

        def train_step(state: TrainState, images, labels, rng):
            i_rng, noise_rng, drop_rng, dropout_rng = jax.random.split(rng, 4)
            batch = images.shape[0]
            idx = jax.random.randint(i_rng, (batch,), 0, n_pairs)
            t = t_arr[idx]
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

            # theta^- — the EMA target network, parameter-frozen
            target_pair = pair_of(
                jax.lax.stop_gradient(state.ema_params)
            )

            def loss_fn(params):
                return consistency_distill_loss(
                    schedule,
                    pair_of(params, dropout_rng),
                    target_pair,
                    teacher_pair,
                    z, t, t_next, y,
                    sigma_data=sigma_data,
                    timestep_scaling=timestep_scaling,
                    distill_cfg_scale=distill_w,
                    loss_type=loss_type,
                    huber_c=huber_c,
                )

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            new_target = gated_ema_update(
                optimizer, new_opt_state,
                state.ema_params, new_params, target_decay,
            )
            return (
                TrainState(params=new_params, opt_state=new_opt_state,
                           ema_params=new_target),
                loss,
            )

        return jax.jit(train_step, donate_argnums=(0,))

    # ----------------------------------------------------------- checkpoint
    def _save(self, epoch, state, best_loss):
        if not self.is_main_process:
            return
        out_cfg = dict(self.teacher_config)
        out_cfg["diffusion_type"] = "consistency"
        out_cfg["num_inference_steps"] = self.sample_steps
        out_cfg["sigma_data"] = self.sigma_data
        out_cfg["timestep_scaling"] = self.timestep_scaling
        if self.distill_cfg_scale > 0.0:
            # provenance: guidance is baked in — downstream CFG should
            # run at the scale-1 conditional limit (0 would select the
            # unconditional branch and silently drop requested labels)
            out_cfg["distilled_cfg_scale"] = self.distill_cfg_scale
            out_cfg["cfg_scale"] = 1.0

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

        write(self.save_dir / "consistency_model.ckpt")
        write(self.save_dir / "current_model.ckpt")

    # ---------------------------------------------------------------- train
    def distill(self):
        """Run consistency distillation; returns the final TrainState."""
        num_batches = max(1, len(self.train_loader))
        # LR-schedule horizon counts real optimizer updates, not
        # micro-steps (parity with DiffusionTrainer at trainer.py:428-431)
        accum = int(self.config.get("gradient_accumulation_steps", 1))
        self.optimizer, self.lr_schedule, _ = build_optimizer(
            self.config, max(1, num_batches // accum)
        )
        student = jax.tree_util.tree_map(jnp.copy, self.teacher_params)
        state = pmesh.replicate(
            self.mesh,
            TrainState(
                params=student,
                opt_state=self.optimizer.init(student),
                # theta^- starts AT the student (paper initialization)
                ema_params=jax.tree_util.tree_map(jnp.copy, student),
            ),
        )
        step_fn = self._build_step()
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
                    f"non-finite consistency loss at epoch {epoch}"
                )
            best = min(best, avg)
            if self.is_main_process:
                print(
                    f"[consistency] epoch {epoch}/{self.epochs} - "
                    f"loss {avg:.5f} - {time.time() - t0:.1f}s"
                )
                self.tracker.log({"consistency/loss": avg}, step=epoch)
        self._save(self.epochs, state, best)
        if self.is_main_process:
            print("Consistency distillation completed!")
            self.tracker.finish()
        return state


class ConsistencyTrainingTrainer:
    """From-scratch consistency TRAINING (Song et al. 2023 Alg. 3, with
    the pseudo-Huber / no-EMA / weighting improvements of Song &
    Dhariwal 2023 available as config keys) — no teacher checkpoint.

    Reached through the ordinary train CLI: a standard training config
    with `diffusion_type: 'consistency'` routes here (train.py), so
    "train a consistency model" and "train a diffusion model" are the
    same user motion. The adjacent-time target pair shares one noise
    draw (`consistency_training_loss`); theta^- is the EMA target
    network (`target_ema_decay: 0.0` = the iCT choice, where the target
    is the stop-gradient student itself).

    Config keys beyond the shared trainer set (all defaults shown):
      consistency_grid_size  : N grid points (default 50)
      ct_grid_schedule       : staged grid sizes, e.g. [10, 20, 40] —
                               epochs split evenly across stages
                               (the paper's progressive N(k); each stage
                               recompiles one jitted step)
      target_ema_decay       : theta^- decay (default 0.95; 0.0 = iCT)
      consistency_loss       : 'huber' (default) | 'l2'
      huber_c                : pseudo-Huber constant (default 0.03)
      ct_weighting           : 'uniform' | 'inverse_gap' (iCT lambda)
      sigma_data, timestep_scaling : boundary scalings
      consistency_sample_steps : num_inference_steps embedded in the
                               output checkpoint (default 2)
      cfg_dropout_prob       : label dropout for f-space CFG capability

    Checkpoints use the standard schema with `diffusion_type:
    'consistency'`, so sample.py/evaluate.py/serving run them unchanged
    (--use_ema selects theta^-, the paper's sampling choice).
    """

    def __init__(
        self,
        model,
        train_loader,
        config: dict,
        rng: Optional[jax.Array] = None,
        tracker: Optional[Tracker] = None,
        resume_path: Optional[str] = None,
    ):
        from ..factory import init_model_params

        cfg = dict(config)
        self.config = cfg
        self.model = model
        self.train_loader = train_loader
        self.resume_path = resume_path

        if cfg.get("super_resolution"):
            raise ValueError(
                "super_resolution is supported by the standard diffusion "
                "trainer (ddpm/flow/edm objectives), not consistency "
                "training"
            )
        self.prediction_type = str(cfg.get("prediction_type", "eps"))
        zero_snr = bool(cfg.get("zero_terminal_snr", False))
        if zero_snr and self.prediction_type == "eps":
            raise ValueError(
                "zero_terminal_snr requires prediction_type 'v' or 'x0' "
                "(eps carries no signal at SNR 0)"
            )
        self.num_timesteps = int(cfg.get("num_timesteps", 1000))
        self.schedule = NoiseSchedule.create(
            self.num_timesteps,
            cfg.get("beta_start", 1e-4),
            cfg.get("beta_end", 0.02),
            cfg.get("beta_schedule", "linear"),
            zero_terminal_snr=zero_snr,
        )

        grid_schedule = cfg.get("ct_grid_schedule")
        if grid_schedule is None:
            grid_schedule = [int(cfg.get("consistency_grid_size", 50))]
        self.grid_schedule = [int(n) for n in grid_schedule]
        if not self.grid_schedule or min(self.grid_schedule) < 2:
            raise ValueError("ct_grid_schedule needs grid sizes >= 2")
        if int(cfg.get("epochs", 1)) < len(self.grid_schedule):
            raise ValueError(
                "epochs must cover ct_grid_schedule: need at least one "
                f"epoch per grid stage ({len(self.grid_schedule)} stages)"
            )
        self.sigma_data = float(cfg.get("sigma_data", 0.5))
        self.timestep_scaling = float(cfg.get("timestep_scaling", 10.0))
        self.loss_type = str(cfg.get("consistency_loss", "huber"))
        self.huber_c = float(cfg.get("huber_c", 0.03))
        self.weighting = str(cfg.get("ct_weighting", "uniform"))
        if self.weighting not in ("uniform", "inverse_gap"):
            raise ValueError(
                f"Unknown ct_weighting: {self.weighting!r} "
                "(expected 'uniform' or 'inverse_gap')"
            )
        self.target_ema_decay = float(cfg.get("target_ema_decay", 0.95))
        if not 0.0 <= self.target_ema_decay < 1.0:
            raise ValueError("target_ema_decay must be in [0, 1)")
        self.sample_steps = int(cfg.get("consistency_sample_steps", 2))
        self.epochs = int(cfg.get("epochs", 1))
        self.save_dir = Path(cfg.get("save_dir", "./checkpoints"))
        self.conditional = bool(cfg.get("conditional", False))
        self.num_classes = cfg.get("num_classes")
        self.cfg_dropout_prob = float(cfg.get("cfg_dropout_prob", 0.0))
        self.image_size = resolve_image_size(cfg["image_size"])
        self.channels = cfg.get("model_params", {}).get("in_channels", 3)

        self.mesh = pmesh.data_parallel_mesh()
        self.is_main_process = pmesh.process_index() == 0
        self.rng = rng if rng is not None else jax.random.PRNGKey(
            cfg.get("seed", 42)
        )
        self.rng, init_rng = jax.random.split(self.rng)
        self.init_params = init_model_params(
            model, init_rng, self.image_size, self.channels,
            self.conditional,
        )
        if self.is_main_process:
            self.save_dir.mkdir(parents=True, exist_ok=True)
            print(
                f"Consistency training from scratch "
                f"({count_parameters(self.init_params):,} params): "
                f"grids {self.grid_schedule}, "
                f"mu={self.target_ema_decay}, {self.weighting} weighting"
            )
        if tracker is not None:
            self.tracker = tracker
        elif self.is_main_process:
            self.tracker = build_tracker(cfg, str(self.save_dir))
        else:
            self.tracker = NullTracker()
        self.step_timer = StepTimer()

    # ---------------------------------------------------------------- step
    def _build_step(self, grid_size: int):
        model = self.model
        schedule = self.schedule
        prediction_type = self.prediction_type
        optimizer = self.optimizer
        conditional = self.conditional
        cfg_dropout = self.cfg_dropout_prob
        num_classes = self.num_classes
        sigma_data = self.sigma_data
        timestep_scaling = self.timestep_scaling
        loss_type = self.loss_type
        huber_c = self.huber_c
        weighting = self.weighting
        target_decay = self.target_ema_decay
        t_arr, t_next_arr = cd_grids(self.num_timesteps, grid_size)
        n_pairs = int(t_arr.shape[0])

        def pair_of(params, dropout_rng=None):
            def fn(x, t, y=None):
                if dropout_rng is not None:
                    kwargs = dict(train=True, rngs={"dropout": dropout_rng})
                else:
                    kwargs = dict(train=False)
                return model.apply({"params": params}, x, t, y, **kwargs)

            return dbase.wrap_model_as_eps_x0(schedule, fn, prediction_type)

        def train_step(state: TrainState, images, labels, rng):
            i_rng, noise_rng, drop_rng, dropout_rng = jax.random.split(rng, 4)
            batch = images.shape[0]
            idx = jax.random.randint(i_rng, (batch,), 0, n_pairs)
            t = t_arr[idx]
            t_next = t_next_arr[idx]
            noise = jax.random.normal(noise_rng, images.shape, images.dtype)

            if conditional:
                y = labels.astype(jnp.int32) + 1
                if cfg_dropout > 0 and num_classes is not None:
                    drop = jax.random.uniform(drop_rng, (batch,)) < cfg_dropout
                    y = jnp.where(drop, 0, y)
            else:
                y = None

            # theta^- — with decay 0 this IS the previous step's student
            # (stop-gradient), the iCT formulation
            target_pair = pair_of(jax.lax.stop_gradient(state.ema_params))

            def loss_fn(params):
                return consistency_training_loss(
                    schedule,
                    pair_of(params, dropout_rng),
                    target_pair,
                    images, noise, t, t_next, y,
                    sigma_data=sigma_data,
                    timestep_scaling=timestep_scaling,
                    loss_type=loss_type,
                    huber_c=huber_c,
                    weighting=weighting,
                )

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            new_target = gated_ema_update(
                optimizer, new_opt_state,
                state.ema_params, new_params, target_decay,
            )
            return (
                TrainState(params=new_params, opt_state=new_opt_state,
                           ema_params=new_target),
                loss,
            )

        return jax.jit(train_step, donate_argnums=(0,))

    # ----------------------------------------------------------- checkpoint
    def _save(self, epoch, state, best_loss):
        if not self.is_main_process:
            return
        out_cfg = dict(self.config)
        out_cfg["diffusion_type"] = "consistency"
        out_cfg["num_inference_steps"] = self.sample_steps
        out_cfg["sigma_data"] = self.sigma_data
        out_cfg["timestep_scaling"] = self.timestep_scaling

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

        write(self.save_dir / "consistency_model.ckpt")
        write(self.save_dir / "current_model.ckpt")

    def _grid_for_epoch(self):
        """Grid size per absolute epoch (1-indexed): epochs split evenly
        across the stages, remainder to the last stage. Validated at
        init so every stage gets >= 1 epoch and the total is EXACTLY
        self.epochs."""
        n_stages = len(self.grid_schedule)
        per_stage = self.epochs // n_stages
        grids = []
        for stage, g in enumerate(self.grid_schedule):
            n = (per_stage if stage < n_stages - 1
                 else self.epochs - per_stage * (n_stages - 1))
            grids.extend([g] * n)
        assert len(grids) == self.epochs
        return grids

    # ---------------------------------------------------------------- train
    def train(self):
        """Run all grid stages; returns the final TrainState."""
        num_batches = max(1, len(self.train_loader))
        # LR-schedule horizon counts real optimizer updates, not
        # micro-steps (parity with DiffusionTrainer at trainer.py:428-431)
        accum = int(self.config.get("gradient_accumulation_steps", 1))
        self.optimizer, self.lr_schedule, _ = build_optimizer(
            self.config, max(1, num_batches // accum)
        )
        start_epoch = 0
        if self.resume_path:
            payload = ckpt_lib.load_checkpoint(self.resume_path)
            r_cfg = payload.get("config") or {}
            if str(r_cfg.get("diffusion_type", "")).lower() != "consistency":
                raise ValueError(
                    "resume_path is not a consistency checkpoint "
                    f"(diffusion_type={r_cfg.get('diffusion_type')!r})"
                )
            params = jax.tree_util.tree_map(
                jnp.asarray, payload["model_state_dict"]
            )
            ema = payload.get("ema_model_state_dict")
            ema = (jax.tree_util.tree_map(jnp.asarray, ema)
                   if ema is not None
                   else jax.tree_util.tree_map(jnp.copy, params))
            opt_state = payload.get("optimizer_state_dict")
            opt_state = (opt_state if opt_state is not None
                         else self.optimizer.init(params))
            start_epoch = int(payload.get("epoch", 0))
            if self.is_main_process:
                print(f"Resuming consistency training from "
                      f"{self.resume_path} (epoch {start_epoch})")
        else:
            # copies: the jitted step donates its state, and init_params
            # must survive (callers compare against it; donation would
            # delete the original buffers)
            params = jax.tree_util.tree_map(jnp.copy, self.init_params)
            opt_state = self.optimizer.init(params)
            # theta^- starts AT the student (paper initialization)
            ema = jax.tree_util.tree_map(jnp.copy, params)
        state = pmesh.replicate(
            self.mesh,
            TrainState(params=params, opt_state=opt_state, ema_params=ema),
        )
        best = float("inf")
        grids = self._grid_for_epoch()
        step_fn, current_grid = None, None
        for epoch in range(1, self.epochs + 1):
            grid_size = grids[epoch - 1]
            if epoch <= start_epoch:
                continue  # resume: stage allocation consumed in order
            if grid_size != current_grid:
                step_fn = self._build_step(grid_size)
                current_grid = grid_size
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
                    f"non-finite consistency-training loss at "
                    f"epoch {epoch}"
                )
            best = min(best, avg)
            if self.is_main_process:
                print(
                    f"[ct] epoch {epoch}/{self.epochs} "
                    f"(grid {grid_size}) - loss {avg:.5f} - "
                    f"{time.time() - t0:.1f}s"
                )
                self.tracker.log(
                    {"ct/loss": avg, "ct/grid_size": grid_size},
                    step=epoch,
                )
            # Rate-limited like DiffusionTrainer.save_checkpoint
            # (trainer.py `save_current_interval`): each _save is TWO
            # full device->host gathers + multi-hundred-MB pickle writes
            # — saving every epoch was the root cause of the "iCT step
            # ~60x slower than the ordinary train step" anomaly
            # (docs/fewstep_quality_run.md r4): at fixture scale a
            # 7-step epoch is ~1 s of compute vs ~1 min of checkpoint
            # IO through the tunnel. The final epoch always saves so a
            # finished run never ends unpersisted; resume_path consumes
            # whatever the last interval wrote.
            save_every = int(
                self.config.get("save_current_interval", 1) or 1
            )
            if epoch % save_every == 0 or epoch == self.epochs:
                self._save(epoch, state, best)
        if self.is_main_process:
            print("Consistency training completed!")
            self.tracker.finish()
        return state

    def cleanup(self):
        pass

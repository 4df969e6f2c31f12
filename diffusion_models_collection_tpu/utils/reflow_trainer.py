"""Reflow — rectified-flow straightening (Liu et al. 2023, the k-th
rectification) — extension beyond the reference.

A trained flow model transports noise z to data x_hat along curved
paths (because training coupled data with INDEPENDENT noise). Reflow
re-trains on the model's OWN couplings: generate pairs (x_hat, z) by
integrating the teacher ODE from z, then fit the same conditional
flow-matching objective on the straight interpolant between the
coupled endpoints

    x_tau = (1 - tau) x_hat + tau z,     target v = z - x_hat.

Each rectification provably straightens the transport (the coupling's
convex-cost is non-increasing), so few-step — eventually 1-step — Euler
sampling approaches the full-ODE result. The output checkpoint stays a
standard `diffusion_type: 'flow_matching'` checkpoint: sample with the
ordinary CLIs at any step count (try `--num_inference_steps 1`).

No dataset is consumed: the pair set is synthesized from the teacher
(the data distribution enters only through the teacher's weights).

TPU-native: pair synthesis is the jitted whole-trajectory flow sampler
batched on device; training is one jitted donated step (teacher pairs
stream from a host buffer like an ordinary loader).
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
from ..diffusion.flow_matching import FlowMatching, interpolate
from ..parallel import mesh as pmesh
from . import checkpoint as ckpt_lib
from .ema import gated_ema_update
from .helpers import count_parameters, resolve_image_size
from .profiler import StepTimer
from .tracker import NullTracker, Tracker, build_tracker
from .trainer import TrainState, build_optimizer


class ReflowTrainer:
    """Rectifies a trained flow-matching checkpoint (k-rectified flow).

    Config keys beyond the shared trainer set:
      teacher_checkpoint   : the flow checkpoint to rectify
      reflow_pairs         : synthetic (x_hat, z) pairs per round
                             (default 2048)
      reflow_rounds        : rectification count k (default 1)
      pair_batch_size      : device batch for BOTH synthesis and
                             training (default batch_size or 64)
      teacher_sample_steps : ODE steps for pair synthesis (default: the
                             teacher config's num_inference_steps)
      reflow_cfg_scale     : CFG scale baked into the synthesized pairs
                             (conditional teachers; default 0 = plain
                             conditional sampling)
      epochs               : training epochs per round
    """

    def __init__(
        self,
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
        if dtype_key not in ("flow", "flow_matching", "rectified_flow"):
            raise ValueError(
                "reflow rectifies FLOW-MATCHING checkpoints; teacher has "
                f"diffusion_type={dtype_key!r} (progressive/consistency "
                "distillation cover the VP family)"
            )
        if t_cfg.get("super_resolution"):
            raise ValueError(
                "reflow does not support super-resolution teachers (pair "
                "synthesis would need an LR conditioning source)"
            )
        self.teacher_config = t_cfg
        self.model = get_model(t_cfg)
        diffusion = get_diffusion(t_cfg)
        assert isinstance(diffusion, FlowMatching)
        self.diffusion = diffusion
        teacher_params = payload.get("ema_model_state_dict")
        if teacher_params is None:
            teacher_params = payload["model_state_dict"]
        self.teacher_params = jax.tree_util.tree_map(
            jnp.asarray, teacher_params
        )

        self.n_pairs = int(cfg.get("reflow_pairs", 2048))
        self.rounds = int(cfg.get("reflow_rounds", 1))
        if self.rounds < 1:
            raise ValueError("reflow_rounds must be >= 1")
        self.batch = int(cfg.get("pair_batch_size",
                                 cfg.get("batch_size", 64)))
        self.sample_steps = int(cfg.get(
            "teacher_sample_steps", t_cfg.get("num_inference_steps", 50)
        ))
        self.reflow_cfg_scale = float(cfg.get("reflow_cfg_scale", 0.0))
        self.epochs = int(cfg.get("epochs", 1))
        self.save_dir = Path(cfg.get("save_dir", "./checkpoints"))
        self.use_ema = bool(cfg.get("use_ema", True))
        self.ema_decay = float(cfg.get("ema_decay", 0.999))
        self.conditional = bool(t_cfg.get("conditional", False))
        self.num_classes = t_cfg.get("num_classes")
        if self.reflow_cfg_scale > 0.0 and not self.conditional:
            raise ValueError("reflow_cfg_scale needs a conditional teacher")
        if self.n_pairs < self.batch:
            raise ValueError("reflow_pairs must be >= pair_batch_size")
        # round UP to a batch multiple: synthesis runs whole device
        # batches anyway (each an expensive ODE solve), so keep every
        # synthesized pair and let every epoch consume all of them
        rounded = math.ceil(self.n_pairs / self.batch) * self.batch
        if rounded != self.n_pairs and pmesh.process_index() == 0:
            print(f"reflow_pairs {self.n_pairs} -> {rounded} "
                  f"(rounded up to a pair_batch_size multiple)")
        self.n_pairs = rounded
        self.image_size = resolve_image_size(t_cfg["image_size"])
        self.channels = t_cfg.get("model_params", {}).get("in_channels", 3)

        self.mesh = pmesh.data_parallel_mesh()
        self.is_main_process = pmesh.process_index() == 0
        if self.is_main_process:
            self.save_dir.mkdir(parents=True, exist_ok=True)
            print(
                f"Reflowing {cfg['teacher_checkpoint']} "
                f"({count_parameters(self.teacher_params):,} params): "
                f"{self.n_pairs} pairs x {self.rounds} round(s), "
                f"{self.sample_steps}-step synthesis"
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

    # ----------------------------------------------------------- synthesis
    def _synthesize_pairs(self, teacher_params, rng):
        """(x_hat, z, y) arrays of n_pairs teacher couplings (host)."""
        h, w = self.image_size
        shape = (self.batch, h, w, self.channels)

        def teacher_fn(x, t, y=None):
            return self.model.apply(
                {"params": teacher_params}, x, t, y, train=False
            )

        fn = jax.tree_util.Partial(teacher_fn)
        xs, zs, ys = [], [], []
        n_batches = math.ceil(self.n_pairs / self.batch)
        for i in range(n_batches):
            rng, z_rng, y_rng, s_rng = jax.random.split(rng, 4)
            z = jax.random.normal(z_rng, shape, jnp.float32)
            if self.conditional:
                # +1-shifted labels, uniform over real classes
                y = jax.random.randint(
                    y_rng, (self.batch,), 1, (self.num_classes or 1) + 1
                )
                if self.reflow_cfg_scale > 0.0:
                    x_hat = self.diffusion.sample_with_cfg(
                        fn, shape, y, s_rng,
                        cfg_scale=self.reflow_cfg_scale, init_noise=z,
                    )
                else:
                    x_hat = self.diffusion.sample(
                        fn, shape, s_rng, y=y, init_noise=z
                    )
                ys.append(np.asarray(y, np.int32))
            else:
                x_hat = self.diffusion.sample(fn, shape, s_rng,
                                              init_noise=z)
            xs.append(np.asarray(x_hat, np.float32))
            zs.append(np.asarray(z, np.float32))
        x = np.concatenate(xs)[: self.n_pairs]
        z = np.concatenate(zs)[: self.n_pairs]
        y = (np.concatenate(ys)[: self.n_pairs]
             if self.conditional else np.zeros((self.n_pairs,), np.int32))
        return x, z, y

    # ---------------------------------------------------------------- step
    def _build_step(self):
        model = self.model
        diffusion = self.diffusion
        optimizer = self.optimizer
        conditional = self.conditional
        use_ema = self.use_ema
        ema_decay = self.ema_decay
        num_timesteps = diffusion.num_timesteps

        def train_step(state: TrainState, x_hat, z, labels, rng):
            t_rng, dropout_rng = jax.random.split(rng)
            b = x_hat.shape[0]
            t = jax.random.randint(t_rng, (b,), 0, num_timesteps)
            tau = diffusion.tau_of_t(t)
            x_t = interpolate(x_hat, tau, z)
            y = labels if conditional else None

            def loss_fn(params):
                v = model.apply(
                    {"params": params}, x_t, t, y, train=True,
                    rngs={"dropout": dropout_rng},
                )
                # the coupled rectified-flow target: v = z - x_hat
                return dbase.diffusion_loss(z - x_hat, v, "l2")

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

    # ----------------------------------------------------------- checkpoint
    def _save(self, round_idx, epoch, state, best_loss):
        if not self.is_main_process:
            return
        out_cfg = dict(self.teacher_config)
        out_cfg["reflow_rounds_done"] = (
            int(self.teacher_config.get("reflow_rounds_done", 0))
            + round_idx
        )

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

        write(self.save_dir / f"reflow_round{round_idx}.ckpt")
        write(self.save_dir / "current_model.ckpt")

    # ---------------------------------------------------------------- train
    def reflow(self):
        """Run all rectification rounds; returns the final TrainState."""
        teacher_params = self.teacher_params
        state = None
        for rnd in range(1, self.rounds + 1):
            self.rng, pair_rng = jax.random.split(self.rng)
            t0 = time.time()
            x_hat, z, y = self._synthesize_pairs(teacher_params, pair_rng)
            if self.is_main_process:
                print(
                    f"[reflow round {rnd}/{self.rounds}] synthesized "
                    f"{len(x_hat)} pairs in {time.time() - t0:.1f}s"
                )

            num_batches = len(x_hat) // self.batch
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
            step_fn = self._build_step()
            best = float("inf")
            for epoch in range(1, self.epochs + 1):
                self.rng, perm_rng = jax.random.split(self.rng)
                order = np.asarray(
                    jax.random.permutation(perm_rng, len(x_hat))
                )
                t0 = time.time()
                losses = []
                for b in range(num_batches):
                    sel = order[b * self.batch:(b + 1) * self.batch]
                    with self.step_timer.step():
                        batch = pmesh.local_batch_to_global(
                            self.mesh,
                            (x_hat[sel], z[sel], y[sel]),
                        )
                        self.rng, step_rng = jax.random.split(self.rng)
                        state, loss = step_fn(
                            state, batch[0], batch[1], batch[2], step_rng
                        )
                        losses.append(loss)
                avg = float(jnp.mean(jnp.stack(losses))) if losses else (
                    float("nan")
                )
                if not math.isfinite(avg):
                    raise RuntimeError(
                        f"non-finite reflow loss at round {rnd} "
                        f"epoch {epoch}"
                    )
                best = min(best, avg)
                if self.is_main_process:
                    print(
                        f"[reflow round {rnd}/{self.rounds}] epoch "
                        f"{epoch}/{self.epochs} - loss {avg:.5f} - "
                        f"{time.time() - t0:.1f}s"
                    )
                    self.tracker.log(
                        {f"reflow/round{rnd}/loss": avg}, step=epoch
                    )
            self._save(rnd, self.epochs, state, best)
            # the (EMA) student's couplings drive the next rectification
            teacher_params = (
                state.ema_params if self.use_ema else state.params
            )
            teacher_params = jax.tree_util.tree_map(
                jnp.asarray, teacher_params
            )
        if self.is_main_process:
            print("Reflow completed!")
            self.tracker.finish()
        return state

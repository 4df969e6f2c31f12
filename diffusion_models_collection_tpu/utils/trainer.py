"""Training runtime (parity target: reference utils/trainer.py:21-421).

TPU-native redesign of the reference's DDP epoch loop:

  * ONE jitted train step fuses q_sample, the model forward/backward,
    global-norm clipping, the optimizer, CFG label dropout and the EMA
    lerp — the reference performs these as separate host-dispatched ops
    (trainer.py:221-273). Gradient accumulation via optax.MultiSteps.
  * Data parallelism is GSPMD: batches sharded over the mesh 'data' axis,
    state replicated; XLA inserts the gradient all-reduce over ICI. The
    loss is a global mean under jit, so there is no separate
    `dist.all_reduce` (trainer.py:277-281) and no process groups.
  * The EMA is an on-device pytree lerp inside the step (replacing the
    rank-0 state-dict walk at trainer.py:187-202), gated on accumulation
    boundaries exactly like the reference (trainer.py:257-265).
  * Loss scalars stay on device during the epoch; one host sync per epoch.

Checkpoint keys and file naming follow the reference contract
(trainer.py:328-365); resume keeps the epoch-extension semantics
(trainer.py:150-154).
"""

from __future__ import annotations

import contextlib
import math
import time
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..parallel import mesh as pmesh
from . import checkpoint as ckpt_lib
from .ema import ema_update
from .helpers import count_parameters, resolve_image_size, save_image_grid
from .lr_schedules import build_lr_schedule
from .profiler import StepTimer, profile_trace
from .tracker import NullTracker, Tracker, build_tracker


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled


def build_optimizer(config: dict, updates_per_epoch: int):
    """Optimizer chain (parity: train.py:131-209 + clip at trainer.py:259).

    torch Adam's `weight_decay` is an L2 term added to the gradient, torch
    AdamW's is decoupled — both reproduced. Clipping precedes the optimizer
    exactly as clip_grad_norm_ precedes optimizer.step().
    """
    lr_schedule = build_lr_schedule(config, updates_per_epoch)
    wd = float(config.get("weight_decay", 0.0))
    opt_type = config.get("optimizer", "adamw").lower()
    if opt_type == "adamw":
        core = optax.adamw(learning_rate=lr_schedule, weight_decay=wd)
    elif opt_type == "adam":
        core = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.adam(learning_rate=lr_schedule),
        )
    # extensions beyond the reference's adam/adamw (train.py:131-150):
    # large-model optimizer-state levers. adafactor factors the second
    # moment into row+col accumulators (O(n+m) instead of O(nm) state —
    # the classic TPU HBM saver); lion keeps only momentum (half of
    # adam's state) with sign updates.
    elif opt_type == "adafactor":
        core = optax.adafactor(
            learning_rate=lr_schedule,
            weight_decay_rate=wd if wd else None,
            # diffusion LRs are absolute (config learning_rate), not
            # parameter-scale-relative
            multiply_by_parameter_scale=False,
            # clip_by_global_norm below is the reference-parity clip;
            # adafactor's internal update clipping stays at its default
        )
    elif opt_type == "lion":
        core = optax.lion(learning_rate=lr_schedule, weight_decay=wd)
    else:
        raise ValueError(f"Unknown optimizer: {opt_type}")
    tx = optax.chain(optax.clip_by_global_norm(1.0), core)
    accum = int(config.get("gradient_accumulation_steps", 1))
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, lr_schedule, accum


class DiffusionTrainer:
    """Trainer (API parity: reference trainer.py:21-421).

    Args mirror the reference where meaningful on TPU; `optimizer` is built
    from the config when not given (the optax transform replaces the torch
    optimizer+scheduler pair — the LR schedule is a pure function of the
    update count, so there is no scheduler object to pass).
    """

    def __init__(
        self,
        model,
        diffusion,
        train_loader,
        optimizer=None,
        config: Optional[dict] = None,
        rng: Optional[jax.Array] = None,
        mesh=None,
        resume_path: Optional[str] = None,
        tracker: Optional[Tracker] = None,
    ):
        self.model = model
        self.diffusion = diffusion
        self.train_loader = train_loader
        self.config = config or {}
        cfg = self.config

        self.epochs = cfg.get("epochs", 100)
        self.save_dir = Path(cfg.get("save_dir", "./checkpoints"))
        self.sample_dir = Path(cfg.get("sample_dir", "./generated_images"))
        self.loss_type = cfg.get("loss_type", "l2")
        self.save_interval = cfg.get("save_interval", 10)
        self.sample_interval = cfg.get("sample_interval", 5)
        self.sample_start_epoch = cfg.get("sample_start_epoch", 20)
        self.num_samples = cfg.get("num_samples", 16)
        self.cfg_dropout_prob = cfg.get("cfg_dropout_prob", 0.2)
        self.cfg_scale = cfg.get("cfg_scale", 1.8)
        self.use_ema = cfg.get("use_ema", False)
        self.ema_decay = cfg.get("ema_decay", 0.9999)
        # Dropout-mask PRNG. 'rbg' (XLA RngBitGenerator) is the default:
        # threefry mask generation measured +50 ms/step on the DiM CIFAR
        # train step on v5e vs +6 ms for rbg (dropout is iid Bernoulli —
        # any counter-based stream satisfies the reference semantics, and
        # runs stay seed-deterministic per backend). 'threefry' opts back
        # into JAX's default stream.
        self.dropout_rng_impl = cfg.get("dropout_rng_impl", "rbg")
        # Per-batch progress bar (parity: reference trainer.py:213-217
        # tqdm). True = show when stderr is a tty (CI logs stay clean);
        # 'force' = always; False = never.
        self.progress = cfg.get("progress", True)
        self.conditional = cfg.get("conditional", False)
        self.num_classes = cfg.get("num_classes", None)
        self.image_size = resolve_image_size(cfg.get("image_size", 32))
        self.in_channels = cfg.get("model_params", {}).get("in_channels", 3)

        # Latent diffusion (extension): with `latent_diffusion: true` +
        # `vae_checkpoint`, the denoiser operates in the frozen VAE's
        # latent space — batches are encoded inside the jitted train step
        # (posterior sample), in-training sample grids decode back to
        # pixels, and the trainer's working geometry IS the latent one.
        from .latent import LatentCodec

        self.latent = LatentCodec.from_config(cfg)
        if self.latent is not None:
            self.image_size = self.latent.latent_hw()
            self.in_channels = self.latent.latent_channels

        # Super-resolution (extension): a `super_resolution` config block
        # trains an SR3-style conditional upsampling stage — the LR
        # conditioning is derived from each batch INSIDE the jitted step
        # (area downsample + resize) and channel-concatenated to x_t
        # (utils/sr.py). Composes with ddpm/flow/edm objectives because
        # the conditioning wraps the model callable, not the loss.
        from .sr import SRSpec

        self.sr = SRSpec.from_config(cfg)
        if self.sr is not None and self.latent is not None:
            raise ValueError(
                "super_resolution composes with pixel-space diffusion "
                "only (the LR conditioning is defined on pixels)"
            )
        # host cache of one real batch: the conditioning source for
        # in-training sample grids (filled by the first train batch)
        self._sr_cond_images = None
        self._sr_cond_saved = False

        # Tensor parallelism (extension beyond the reference): with
        # `tensor_parallel: N` the mesh becomes 2-D (data, model), params
        # shard by the Megatron rules (parallel/tensor_parallel.py) and
        # DiM's selective scan runs under its shard_map context.
        self.tp = int(cfg.get("tensor_parallel", 1) or 1)
        # Pipeline parallelism (extension): `pipeline_parallel: S` runs
        # the DiT/DiM block stack as a GPipe microbatch pipeline over a
        # 'stage' mesh axis (parallel/pipeline_parallel.py). Composes with
        # `tensor_parallel` for DiT (3-D dp x pp x tp: the pipeline
        # shard_map is manual over (data, stage) while 'model' stays a
        # GSPMD auto axis, so the stacked block params carry their
        # Megatron shardings straight through the pipeline body).
        self.pp = int(cfg.get("pipeline_parallel", 1) or 1)
        # Sequence parallelism (extension): `sequence_parallel: S` splits
        # the patch-token axis over a 'seq' mesh axis — DiT: Q local, K/V
        # all-gathered per block (parallel/sequence_parallel.py); DiM: the
        # selective scan runs distributed (parallel/dim_sequence_parallel
        # .py). Params stay replicated in the standard layout.
        self.sp = int(cfg.get("sequence_parallel", 1) or 1)
        # Expert parallelism (extension): `expert_parallel: E` shards the
        # MoE DiT's stacked expert weights over an 'expert' mesh axis
        # (parallel/expert_parallel.py) — XLA partitions the expert
        # einsums and inserts the dispatch/combine all-to-alls. The dense
        # remainder of the network treats 'expert' as extra data
        # parallelism (grads reduce over both axes).
        self.ep = int(cfg.get("expert_parallel", 1) or 1)
        # Load-balance aux loss weight (Switch Transformer's 1e-2
        # default); only active when the model routes experts.
        self.moe_aux_weight = float(cfg.get("moe_aux_weight", 0.01))
        if self.ep > 1:
            if self.tp > 1 or self.pp > 1 or self.sp > 1:
                raise ValueError(
                    "expert_parallel composes with plain data parallelism "
                    "only — not tensor/pipeline/sequence parallelism"
                )
            num_experts = int(getattr(model, "num_experts", 0) or 0)
            if num_experts <= 0:
                raise ValueError(
                    "expert_parallel > 1 needs a MoE model "
                    "(DiT with num_experts > 0)"
                )
            if num_experts % self.ep:
                raise ValueError(
                    f"num_experts {num_experts} not divisible by "
                    f"expert_parallel={self.ep}"
                )
        if self.sp > 1 and self.pp > 1:
            raise ValueError(
                "sequence_parallel cannot be combined with "
                "pipeline_parallel (both own the block-stack dataflow)"
            )
        if int(getattr(model, "num_experts", 0) or 0) > 0 and (
            self.pp > 1 or self.sp > 1
        ):
            raise ValueError(
                "MoE models (num_experts > 0) do not support pipeline/"
                "sequence parallelism (their shard_map bodies drop the "
                "sown load-balance loss); use expert_parallel, "
                "tensor_parallel, fsdp or plain data parallelism"
            )
        if self.tp > 1 and self.pp > 1:
            if type(model).__name__ != "DiT":
                raise ValueError(
                    "pipeline_parallel x tensor_parallel is supported for "
                    "DiT (DiM's Pallas selective scan needs its own "
                    "'model'-axis shard_map, which cannot nest inside the "
                    "pipeline's manual (data, stage) context)"
                )
        # FSDP / ZeRO (extension): `fsdp: true` stores params, Adam
        # moments and EMA sharded over the 'data' axis (parallel/fsdp.py)
        # — XLA all-gathers weights before use and reduce-scatters grads,
        # cutting per-device state memory by the DP degree. Composes with
        # tensor_parallel (hybrid ZeRO x Megatron: each leaf's largest
        # TP-free dim shards over 'data' on top of its TP spec); PP/SP
        # own their layouts via shard_map in_specs and stay exclusive.
        self.fsdp = bool(cfg.get("fsdp", False))
        if self.fsdp and (self.pp > 1 or self.sp > 1 or self.ep > 1):
            raise ValueError(
                "fsdp cannot be combined with pipeline_parallel, "
                "sequence_parallel or expert_parallel (those strategies "
                "define their own parameter layouts); fsdp + "
                "tensor_parallel is supported"
            )
        self.fsdp_min_size = cfg.get("fsdp_min_size")
        if self.pp > 1:
            name = type(model).__name__
            if name not in ("DiT", "DiM"):
                raise ValueError(
                    "pipeline_parallel supports the DiT and DiM backbones "
                    f"(got {name})"
                )
            if name == "DiM" and model.use_attention_fallback:
                raise ValueError(
                    "pipeline_parallel for DiM runs the Mamba mixer stack — "
                    "the attention fallback has no pipelined path"
                )
            if model.depth % self.pp:
                raise ValueError(
                    f"{name} depth {model.depth} not divisible by "
                    f"pipeline_parallel={self.pp}"
                )
        if self.sp > 1:
            name = type(model).__name__
            if name not in ("DiT", "DiM"):
                raise ValueError(
                    "sequence_parallel supports the DiT and DiM backbones "
                    f"(got {name})"
                )
            if name == "DiM" and model.use_attention_fallback:
                raise ValueError(
                    "sequence_parallel for DiM runs the Mamba mixer — the "
                    "attention fallback has no distributed path"
                )
            img_h, img_w = model._hw()
            n_tok = (img_h // model.patch_size) * (img_w // model.patch_size)
            if n_tok % self.sp:
                raise ValueError(
                    f"{n_tok} patch tokens not divisible by "
                    f"sequence_parallel={self.sp}"
                )
            if name == "DiM":
                from ..parallel.dim_sequence_parallel import CONV_HALO

                if n_tok // self.sp < CONV_HALO:
                    raise ValueError(
                        f"{n_tok // self.sp} local tokens per shard < the "
                        f"causal-conv halo ({CONV_HALO}) — lower "
                        "sequence_parallel"
                    )
        if mesh is not None:
            self.mesh = mesh
            if self.tp > 1 and "model" not in mesh.axis_names:
                raise ValueError(
                    "tensor_parallel > 1 needs a mesh with a 'model' axis"
                )
            if self.pp > 1 and "stage" not in mesh.axis_names:
                raise ValueError(
                    "pipeline_parallel > 1 needs a mesh with a 'stage' axis"
                )
            if self.sp > 1 and "seq" not in mesh.axis_names:
                raise ValueError(
                    "sequence_parallel > 1 needs a mesh with a 'seq' axis"
                )
            if self.ep > 1 and "expert" not in mesh.axis_names:
                raise ValueError(
                    "expert_parallel > 1 needs a mesh with an 'expert' axis"
                )
        elif self.tp > 1 and self.sp > 1:
            from ..parallel.sequence_parallel import data_seq_model_mesh

            ndev = len(jax.devices())
            if ndev % (self.sp * self.tp):
                raise ValueError(
                    f"sequence_parallel={self.sp} x tensor_parallel="
                    f"{self.tp} does not divide {ndev} devices"
                )
            self.mesh = data_seq_model_mesh(
                ndev // (self.sp * self.tp), self.sp, self.tp
            )
        elif self.tp > 1 and self.pp > 1:
            from ..parallel.pipeline_parallel import data_stage_model_mesh

            ndev = len(jax.devices())
            if ndev % (self.pp * self.tp):
                raise ValueError(
                    f"pipeline_parallel={self.pp} x tensor_parallel="
                    f"{self.tp} does not divide {ndev} devices"
                )
            self.mesh = data_stage_model_mesh(
                ndev // (self.pp * self.tp), self.pp, self.tp
            )
        elif self.tp > 1:
            from ..parallel.tensor_parallel import data_model_mesh

            ndev = len(jax.devices())
            if ndev % self.tp:
                raise ValueError(
                    f"tensor_parallel={self.tp} does not divide "
                    f"{ndev} devices"
                )
            self.mesh = data_model_mesh(ndev // self.tp, self.tp)
        elif self.pp > 1:
            from ..parallel.pipeline_parallel import data_stage_mesh

            ndev = len(jax.devices())
            if ndev % self.pp:
                raise ValueError(
                    f"pipeline_parallel={self.pp} does not divide "
                    f"{ndev} devices"
                )
            self.mesh = data_stage_mesh(ndev // self.pp, self.pp)
        elif self.sp > 1:
            from ..parallel.sequence_parallel import data_seq_mesh

            ndev = len(jax.devices())
            if ndev % self.sp:
                raise ValueError(
                    f"sequence_parallel={self.sp} does not divide "
                    f"{ndev} devices"
                )
            self.mesh = data_seq_mesh(ndev // self.sp, self.sp)
        elif self.ep > 1:
            from ..parallel.expert_parallel import data_expert_mesh

            ndev = len(jax.devices())
            if ndev % self.ep:
                raise ValueError(
                    f"expert_parallel={self.ep} does not divide "
                    f"{ndev} devices"
                )
            self.mesh = data_expert_mesh(ndev // self.ep, self.ep)
        else:
            self.mesh = pmesh.data_parallel_mesh()
        self.is_main_process = pmesh.process_index() == 0
        self.world_size = self.mesh.devices.size
        if self.pp > 1 or self.sp > 1:
            # shard_map's in_specs P('data') needs exact divisibility —
            # validate up front instead of crashing mid-run with a
            # low-level sharding error (plain DP tolerates uneven batches
            # because it uses jit, not shard_map).
            which = "pipeline_parallel" if self.pp > 1 else \
                "sequence_parallel"
            dp_size = self.mesh.shape[pmesh.DATA_AXIS]
            global_batch = (
                getattr(train_loader, "batch_size", 0) or 0
            ) * pmesh.process_count()
            if global_batch and global_batch % dp_size:
                raise ValueError(
                    f"global batch size {global_batch} not divisible by "
                    f"the data-axis size {dp_size} required by {which}"
                )
            if self.num_samples % dp_size:
                raise ValueError(
                    f"num_samples {self.num_samples} not divisible by the "
                    f"data-axis size {dp_size} required by {which} "
                    "(in-training sample grids run through shard_map)"
                )

        if self.is_main_process:
            self.save_dir.mkdir(parents=True, exist_ok=True)
            self.sample_dir.mkdir(parents=True, exist_ok=True)

        self.rng = rng if rng is not None else jax.random.PRNGKey(cfg.get("seed", 42))
        self.rng, init_rng = jax.random.split(self.rng)

        # --- init params (one jitted CPU computation; see factory) ---------
        from ..factory import init_model_params

        self.params = init_model_params(
            model, init_rng, self.image_size,
            # SR models consume [x_t ; upsampled LR] on the channel axis
            self.in_channels * 2 if self.sr is not None else self.in_channels,
            self.conditional,
        )
        self._pp_apply = None
        if self.pp > 1:
            from ..parallel import pipeline_parallel as pp_lib

            # TrainState holds the PP layout ({"blocks", "rest"});
            # checkpoints convert back to the standard tree on save.
            self._pp_prefix = pp_lib.block_prefix_for(model)
            self.params = pp_lib.to_pp_tree(self.params, model.depth,
                                            self._pp_prefix)
            self._pp_apply = pp_lib.make_pipeline_apply(
                model, self.mesh,
                num_microbatches=cfg.get("pp_microbatches") or self.pp,
            )
        self._sp_apply = None
        if self.sp > 1:
            if type(model).__name__ == "DiM":
                from ..parallel.dim_sequence_parallel import (
                    make_dim_sequence_parallel_apply as _make_sp,
                )
            else:
                from ..parallel.sequence_parallel import (
                    make_sequence_parallel_apply as _make_sp,
                )

            self._sp_apply = _make_sp(model, self.mesh)
        if self.is_main_process:
            print(f"Model parameters: {count_parameters(self.params):,}")

        # --- optimizer -----------------------------------------------------
        num_batches = max(1, len(train_loader))
        if optimizer is None:
            self.accum = int(cfg.get("gradient_accumulation_steps", 1))
            updates_per_epoch = max(1, num_batches // self.accum)
            optimizer, self.lr_schedule, self.accum = build_optimizer(
                cfg, updates_per_epoch
            )
        else:
            self.lr_schedule = lambda c: jnp.asarray(
                cfg.get("learning_rate", 1e-4), jnp.float32
            )
            self.accum = int(cfg.get("gradient_accumulation_steps", 1))
        self.optimizer = optimizer
        opt_state = optimizer.init(self.params)
        # EMA starts as a *copy* of params (trainer.py:156-173); distinct
        # buffers matter because the train step donates its input state.
        ema_params = (
            jax.tree_util.tree_map(jnp.copy, self.params)
            if self.use_ema
            else None
        )

        self.state = TrainState(
            params=self.params, opt_state=opt_state, ema_params=ema_params
        )
        self.state = self._place_state(self.state)
        if self.fsdp and self.is_main_process:
            from ..parallel.fsdp import sharded_fraction

            # axis='data' so hybrid FSDPxTP runs report true ZeRO
            # coverage, not TP's 'model'-axis sharding
            print(
                f"FSDP: "
                f"{sharded_fraction(self.state.params, pmesh.DATA_AXIS):.0%}"
                f" of parameter elements sharded over "
                f"{self.mesh.shape[pmesh.DATA_AXIS]} devices"
            )

        self.best_loss = float("inf")
        self.start_epoch = 1
        self.global_step = 0
        self._replicate_jit = None  # lazy; see _replicator()

        self._train_step = self._build_train_step()
        if self.tp > 1:
            from ..ops.selective_scan import scan_tensor_parallel

            self._tp_scope = lambda: scan_tensor_parallel(self.mesh, "model")
        elif self.ep > 1:
            # Expert parallelism: trace/step under jax.set_mesh so MoeMlp's
            # with_sharding_constraint pins (models/moe.py) can resolve the
            # 'expert' axis from the ambient mesh — they turn the
            # batch-sharded -> expert-sharded layout flip into the intended
            # token all-to-all instead of a full rematerialization.
            self._tp_scope = lambda: jax.set_mesh(self.mesh)
        else:
            self._tp_scope = contextlib.nullcontext

        if resume_path:
            self.load_checkpoint(resume_path)

        if tracker is not None:
            self.tracker = tracker
        elif self.is_main_process:
            self.tracker = build_tracker(cfg, str(self.save_dir))
        else:
            self.tracker = NullTracker()

        self.step_timer = StepTimer()
        self.profile_dir = cfg.get("profile_dir")

    def _place_state(self, state: "TrainState") -> "TrainState":
        """Replicate (DP), Megatron-shard (DP x TP), stage-shard (DP x PP,
        plus Megatron over 'model' when composed with TP) or ZeRO-shard
        (FSDP) the train state."""
        if self.pp > 1:
            # checked BEFORE tp: under PP x TP the state lives in the PP
            # {"blocks","rest"} layout and shard_pp_param_tree applies the
            # Megatron 'model' specs to the stacked blocks itself.
            from ..parallel.pipeline_parallel import shard_state_for_pp

            return shard_state_for_pp(self.mesh, state)
        if self.tp > 1:
            from ..parallel.tensor_parallel import shard_state_for_tp

            kw = {}
            if self.fsdp_min_size is not None:
                kw["zero_min_size"] = int(self.fsdp_min_size)
            return shard_state_for_tp(self.mesh, state, zero=self.fsdp, **kw)
        if self.fsdp:
            from ..parallel import fsdp as fsdp_lib

            kw = {}
            if self.fsdp_min_size is not None:
                kw["min_size"] = int(self.fsdp_min_size)
            return fsdp_lib.shard_state_for_fsdp(self.mesh, state, **kw)
        if self.ep > 1:
            from ..parallel.expert_parallel import shard_state_for_ep

            return shard_state_for_ep(self.mesh, state)
        return pmesh.replicate(self.mesh, state)

    # ---------------------------------------------------------------- step
    def _build_train_step(self):
        # The diffusion object supplies the training objective polymorphically
        # (DDPM/DDIM eps-space p_losses, v/x0 prediction types, flow matching);
        # its coefficient arrays become jit constants via this closure.
        diffusion = self.diffusion
        num_timesteps = self.diffusion.num_timesteps
        model = self.model
        optimizer = self.optimizer
        conditional = self.conditional
        num_classes = self.num_classes
        cfg_dropout = float(self.cfg_dropout_prob)
        loss_type = self.loss_type
        use_ema = self.use_ema
        ema_decay = float(self.ema_decay)
        is_multisteps = isinstance(optimizer, optax.MultiSteps)
        dropout_rng_impl = self.dropout_rng_impl
        pp_apply = self._pp_apply
        sp_apply = self._sp_apply
        # MoE load-balance aux loss (models/moe.py sows 'losses'): active
        # only when the model routes experts. PP/SP exclude MoE (trainer
        # validation), so only the plain-apply branch collects it.
        moe_aux = (
            float(self.moe_aux_weight)
            if int(getattr(model, "num_experts", 0) or 0) > 0
            else 0.0
        )

        def _dropout_key(raw):
            """Re-key the dropout stream on the configured PRNG impl."""
            if dropout_rng_impl in (None, "threefry", "default"):
                return raw
            data = raw
            if jnp.issubdtype(data.dtype, jax.dtypes.prng_key):
                data = jax.random.key_data(data)
            data = data.astype(jnp.uint32).reshape(-1)
            reps = -(-4 // data.shape[0])  # rbg keys are 4x uint32
            return jax.random.wrap_key_data(
                jnp.tile(data, reps)[:4], impl=dropout_rng_impl
            )

        latent = self.latent
        sr = self.sr

        def train_step(state: TrainState, images, labels, rng):
            sr_cond = None
            if sr is not None:
                # SR-only split keeps non-SR runs' RNG streams exact
                rng, sr_rng = jax.random.split(rng)
                from . import sr as sr_lib

                sr_cond = sr_lib.make_condition(
                    sr, images.shape[1:3], hr_images=images, rng=sr_rng
                )
            if latent is not None:
                # pixel batch -> scaled latent posterior sample; the VAE
                # params ride as frozen jit-closure constants (the 5-way
                # split is latent-only so pixel-space runs keep their
                # exact pre-latent RNG streams)
                t_rng, noise_rng, drop_rng, dropout_rng, enc_rng = (
                    jax.random.split(rng, 5)
                )
                images = latent.encode(images, enc_rng)
            else:
                t_rng, noise_rng, drop_rng, dropout_rng = (
                    jax.random.split(rng, 4)
                )
            dropout_rng = _dropout_key(dropout_rng)
            batch = images.shape[0]
            t = jax.random.randint(t_rng, (batch,), 0, num_timesteps)
            noise = jax.random.normal(noise_rng, images.shape, images.dtype)

            if conditional:
                # +1 shift, 0 reserved as CFG null; random dropout to null
                # (parity: trainer.py:226-231)
                y = labels.astype(jnp.int32) + 1
                if cfg_dropout > 0 and num_classes is not None:
                    drop = jax.random.uniform(drop_rng, (batch,)) < cfg_dropout
                    y = jnp.where(drop, 0, y)
            else:
                y = None

            def loss_fn(params):
                aux_box = []
                if pp_apply is not None:
                    def model_fn(x, tt, yy):
                        return pp_apply(
                            params["blocks"], params["rest"], x, tt, yy,
                            dropout_rng=dropout_rng, train=True,
                        )
                elif sp_apply is not None:
                    def model_fn(x, tt, yy):
                        return sp_apply(
                            params, x, tt, yy,
                            dropout_rng=dropout_rng, train=True,
                        )
                elif moe_aux > 0:
                    def model_fn(x, tt, yy):
                        eps, sown = model.apply(
                            {"params": params},
                            x,
                            tt,
                            yy,
                            train=True,
                            rngs={"dropout": dropout_rng},
                            mutable=["losses"],
                        )
                        vals = jax.tree_util.tree_leaves(
                            sown.get("losses", {})
                        )
                        if vals:
                            # mean over blocks (each MoeMlp sows one scalar)
                            aux_box.append(sum(vals) / len(vals))
                        return eps
                else:
                    def model_fn(x, tt, yy):
                        return model.apply(
                            {"params": params},
                            x,
                            tt,
                            yy,
                            train=True,
                            rngs={"dropout": dropout_rng},
                        )

                if sr_cond is not None:
                    from .sr import wrap_model_fn as _sr_wrap

                    model_fn = _sr_wrap(model_fn, sr_cond)

                main = diffusion.p_losses(
                    model_fn, images, t, noise, y=y, loss_type=loss_type
                )
                if aux_box:
                    main = main + moe_aux * aux_box[0]
                return main

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)

            new_ema = state.ema_params
            if use_ema:
                if is_multisteps:
                    applied = optimizer.has_updated(new_opt_state)
                    lerped = ema_update(state.ema_params, new_params, ema_decay)
                    new_ema = jax.tree_util.tree_map(
                        lambda e_new, e_old: jnp.where(applied, e_new, e_old),
                        lerped,
                        state.ema_params,
                    )
                else:
                    new_ema = ema_update(state.ema_params, new_params, ema_decay)

            return (
                TrainState(
                    params=new_params,
                    opt_state=new_opt_state,
                    ema_params=new_ema,
                ),
                loss,
            )

        if self.fsdp:
            # Pin the updated state to the input layout: without explicit
            # out_shardings XLA may choose replicated outputs, which both
            # defeats the memory saving and breaks the donation match.
            from jax.sharding import NamedSharding, PartitionSpec

            state_sh = jax.tree_util.tree_map(
                lambda x: x.sharding, self.state
            )
            return jax.jit(
                train_step,
                donate_argnums=(0,),
                out_shardings=(
                    state_sh, NamedSharding(self.mesh, PartitionSpec())
                ),
            )
        return jax.jit(train_step, donate_argnums=(0,))

    # --------------------------------------------------------------- epoch
    def train_epoch(self, epoch: int) -> float:
        """One epoch (parity: trainer.py:204-283). Returns the mean loss
        over batches — already a global mean across devices/processes."""
        if hasattr(self.train_loader, "set_epoch"):
            self.train_loader.set_epoch(epoch)

        bar = self._progress_bar(epoch)
        losses = []
        try:
            for images, labels in self.train_loader:
                if self.sr is not None and self._sr_cond_images is None:
                    # conditioning source for in-training sample grids:
                    # real images from the first batch seen
                    self._sr_cond_images = np.asarray(
                        images, np.float32
                    )[: self.num_samples]
                with self.step_timer.step():
                    batch = pmesh.local_batch_to_global(
                        self.mesh,
                        (
                            np.asarray(images, dtype=np.float32),
                            np.asarray(labels if labels is not None else
                                       np.zeros(len(images)), dtype=np.int32),
                        ),
                    )
                    self.rng, step_rng = jax.random.split(self.rng)
                    with self._tp_scope():
                        self.state, loss = self._train_step(
                            self.state, batch[0], batch[1], step_rng
                        )
                    losses.append(loss)
                    self.global_step += 1
                if bar is not None:
                    bar.update(1)
                    if len(losses) >= 2:
                        # display the PREVIOUS step's loss: it has already
                        # materialized behind the async dispatch of the
                        # current step, so the readback never stalls the
                        # device pipeline (reference shows per-batch loss,
                        # trainer.py:270-273).
                        bar.set_postfix(
                            loss=f"{float(losses[-2]):.4f}", refresh=False
                        )
        finally:
            if bar is not None:
                bar.close()

        if not losses:
            return float("nan")
        return float(jnp.mean(jnp.stack(losses)))

    def _progress_bar(self, epoch: int):
        """tqdm over batches, gated to rank 0 + a tty (or progress='force')."""
        import sys

        if not self.is_main_process or not self.progress:
            return None
        if self.progress != "force" and not sys.stderr.isatty():
            return None
        try:
            from tqdm import tqdm
        except ImportError:
            # progress is cosmetic — a minimal install (pyproject declares
            # jax/flax/optax/numpy/pillow/scipy only) must still train
            return None
        try:
            total = len(self.train_loader)
        except TypeError:
            total = None
        return tqdm(
            total=total,
            desc=f"Epoch {epoch}/{self.epochs}",
            leave=False,
            dynamic_ncols=True,
        )

    # ------------------------------------------------------------- sampling
    def _eval_model_fn(self, use_ema: Optional[bool] = None):
        """Eval-mode denoiser closure over (EMA) params (trainer.py:291)."""
        params = self.state.params
        if (use_ema if use_ema is not None else self.use_ema) and (
            self.state.ema_params is not None
        ):
            params = self.state.ema_params
        if jax.process_count() > 1 and any(
            self._needs_collective_gather(l)
            for l in jax.tree_util.tree_leaves(params)
        ):
            # multihost FSDP: sampler scans embed params as jit-closure
            # constants, which cannot span processes — replicate first
            # (collective; every process runs sample_images; the cached
            # replicator avoids a retrace per epoch).
            params = self._replicator()(params)

        if self._pp_apply is not None:
            pp_apply = self._pp_apply

            def fn(x, t, y):
                return pp_apply(
                    params["blocks"], params["rest"], x, t, y, train=False
                )
        elif self._sp_apply is not None:
            sp_apply = self._sp_apply

            def fn(x, t, y):
                return sp_apply(params, x, t, y, train=False)
        else:
            def fn(x, t, y):
                return self.model.apply(
                    {"params": params}, x, t, y, train=False
                )

        return jax.tree_util.Partial(fn)

    def sample_images(self, epoch: int, num_samples: Optional[int] = None):
        """In-training sample grid (parity: trainer.py:286-326)."""
        if num_samples is None:
            num_samples = self.num_samples
        h, w = self.image_size
        shape = (num_samples, h, w, self.in_channels)
        nrow = max(1, int(math.sqrt(num_samples)))
        model_fn = self._eval_model_fn()

        self.rng, sample_rng = jax.random.split(self.rng)
        with self._tp_scope():
            return self._sample_images_inner(
                epoch, num_samples, shape, nrow, model_fn, sample_rng
            )

    def _dp_sampling_inputs(self, shape, sample_rng, labels):
        """Shard in-training sampling over the 'data' axis when the state
        layout is replicated-or-FSDP (TP/PP/SP own their layouts) and the
        batch divides — otherwise every device computes the full grid
        redundantly. Single-process only (multi-host sampling stays
        replicated so rank 0 can materialize the grid)."""
        if self.tp > 1 or self.pp > 1 or self.sp > 1:
            return None, labels
        from ..factory import dp_sampling_sharding, sharded_init_noise

        sharding = dp_sampling_sharding(shape[0])
        if sharding is None:
            return None, labels
        noise = sharded_init_noise(sample_rng, shape, sharding)
        if labels is not None:
            labels = jax.device_put(labels, sharding)
        return noise, labels

    def _sample_images_inner(self, epoch, num_samples, shape, nrow, model_fn,
                             sample_rng):
        if self.sr is not None:
            model_fn = self._sr_wrap_for_sampling(
                model_fn, num_samples, nrow, sample_rng
            )
            if model_fn is None:
                return None
        if self.conditional and self.num_classes:
            num_rows = (num_samples + nrow - 1) // nrow
            row_labels = np.arange(num_rows) % self.num_classes
            labels = jnp.asarray(
                np.repeat(row_labels + 1, nrow)[:num_samples], jnp.int32
            )
            if self.is_main_process:
                print(f"Sampling with labels: {np.asarray(labels)}")
            init_noise, labels = self._dp_sampling_inputs(
                shape, sample_rng, labels
            )
            samples = self.diffusion.sample_with_cfg(
                model_fn, shape, labels, sample_rng,
                cfg_scale=self.cfg_scale, init_noise=init_noise,
            )
        else:
            init_noise, _ = self._dp_sampling_inputs(shape, sample_rng, None)
            samples = self.diffusion.sample(model_fn, shape, sample_rng,
                                            init_noise=init_noise)

        if self.latent is not None:
            samples = self.latent.decode(samples)
        samples = np.clip((np.asarray(samples) + 1) / 2, 0, 1)
        if self.is_main_process:
            save_path = self.sample_dir / f"epoch_{epoch:04d}.png"
            save_image_grid(samples, save_path, nrow=nrow)
            self.tracker.log_image("samples", str(save_path), step=epoch)
        return samples

    def _sr_wrap_for_sampling(self, model_fn, num_samples, nrow, sample_rng):
        """Condition the in-training sample grid on cached real images
        (super-resolution runs). Returns the wrapped model_fn, or None
        when no conditioning batch has been cached yet."""
        from . import sr as sr_lib

        if self._sr_cond_images is None:
            if self.is_main_process:
                print("SR sample grid skipped: no train batch seen yet")
            return None
        src = self._sr_cond_images
        if len(src) < num_samples:
            reps = -(-num_samples // len(src))
            src = np.tile(src, (reps, 1, 1, 1))
        src = src[:num_samples]
        cond = sr_lib.make_condition(
            self.sr, self.image_size, hr_images=jnp.asarray(src),
            rng=jax.random.fold_in(sample_rng, 7),
        )
        if self.is_main_process and not self._sr_cond_saved:
            # the LR view the model actually sees, for visual comparison
            # against the generated grids
            grid = np.clip((np.asarray(cond) + 1) / 2, 0, 1)
            save_image_grid(grid, self.sample_dir / "sr_condition.png",
                            nrow=nrow)
            self._sr_cond_saved = True
        return sr_lib.wrap_model_fn(model_fn, cond)

    # ---------------------------------------------------------- checkpoints
    @staticmethod
    def _needs_collective_gather(leaf) -> bool:
        """True when this host's addressable shards do NOT cover the
        array (e.g. FSDP's 'data' axis spans processes), so materializing
        it requires a cross-host collective. Intra-process sharding with
        cross-process replication (multihost TP) is coverable and returns
        False."""
        if not isinstance(leaf, jax.Array):
            return False
        if leaf.is_fully_addressable or leaf.is_fully_replicated:
            return False

        def key(idx):
            return tuple((s.start, s.stop) for s in idx)

        idx_map = leaf.sharding.devices_indices_map(leaf.shape)
        covered = {
            key(idx_map[d]) for d in leaf.sharding.addressable_devices
        }
        return not {key(i) for i in idx_map.values()} <= covered

    def _replicator(self):
        """ONE cached jitted identity with replicated out_shardings (the
        XLA all-gather over DCN/ICI); per-shape compiles are cached inside
        the jit object, so repeated saves/samples don't retrace."""
        if self._replicate_jit is None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._replicate_jit = jax.jit(
                lambda t: t,
                out_shardings=NamedSharding(self.mesh, PartitionSpec()),
            )
        return self._replicate_jit

    def _gather_for_save(self):
        """(params, opt_state, ema) materializable on this host. Runs
        BEFORE the rank-0 save gate: when state shards span processes,
        EVERY process participates in the replicating reshard. Gathering
        goes leaf-at-a-time straight to host numpy, so the device-memory
        peak is the sharded state plus ONE replicated leaf — never the
        full replicated state (which is exactly what FSDP exists to
        avoid). Single-process or host-coverable state passes through
        untouched."""
        trees = (self.state.params, self.state.opt_state,
                 self.state.ema_params)
        if jax.process_count() == 1:
            return trees

        rep = None

        def gather_leaf(l):
            nonlocal rep
            if not self._needs_collective_gather(l):
                return l
            if rep is None:
                rep = self._replicator()
            return np.asarray(rep(l))

        return tuple(
            jax.tree_util.tree_map(gather_leaf, t) if t is not None else None
            for t in trees
        )

    def save_checkpoint(
        self, epoch: int, is_best: bool = False, is_last: bool = False
    ):
        """Parity: trainer.py:328-365 (current/best/periodic files).

        `save_current_interval` (config, default 1 = reference parity)
        rate-limits the per-epoch current_model.ckpt write: at large
        model sizes the serialized state is hundreds of MB and writing it
        every epoch can dominate short-epoch runs (observed: 634 MB/epoch
        on the CIFAR UNet turned a 7-step epoch into a minute of IO).
        best/periodic files are unaffected. The FINAL epoch always writes
        current_model.ckpt regardless of the interval so a finished run
        never ends with its newest weights unpersisted."""
        save_current_every = int(
            self.config.get("save_current_interval", 1) or 1
        )
        write_current = is_last or epoch % save_current_every == 0
        # best fires on nearly every epoch of a steadily-improving run —
        # same IO knob rationale (config `save_best`, default parity)
        write_best = is_best and bool(self.config.get("save_best", True))
        write_periodic = epoch % self.save_interval == 0
        if not (write_current or write_best or write_periodic):
            return  # skip the device->host gather too
        params, opt_state, ema = self._gather_for_save()
        if not self.is_main_process:
            return
        if self.pp > 1:
            # checkpoints always use the standard layout — PP and non-PP
            # runs load each other's files
            from ..parallel.pipeline_parallel import from_pp_tree

            params = from_pp_tree(params, self.model.depth, self._pp_prefix)
            ema = (
                from_pp_tree(ema, self.model.depth, self._pp_prefix)
                if ema is not None else None
            )

        def write(path):
            ckpt_lib.save_checkpoint(
                path,
                epoch=epoch,
                params=params,
                opt_state=opt_state,
                best_loss=self.best_loss,
                config=self.config,
                ema_params=ema,
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
        """Parity: trainer.py:120-154 incl. epoch-extension semantics."""
        print(f"Loading checkpoint from {checkpoint_path}...")
        payload = ckpt_lib.load_checkpoint(checkpoint_path)
        params = payload["model_state_dict"]
        opt_state = payload.get("optimizer_state_dict", self.state.opt_state)
        ema = payload.get("ema_model_state_dict")
        if ema is None and self.use_ema:
            ema = jax.tree_util.tree_map(np.copy, params)
        if self.pp > 1:
            from ..parallel.pipeline_parallel import to_pp_tree

            params = to_pp_tree(params, self.model.depth, self._pp_prefix)
            ema = (
                to_pp_tree(ema, self.model.depth, self._pp_prefix)
                if ema is not None else None
            )
        # checkpoints always store the STANDARD param layout, so params/EMA
        # interchange freely between PP and non-PP runs — but optimizer
        # moments mirror the in-memory layout; reinitialize them when the
        # layout changed (e.g. resuming a DP checkpoint under PP).
        if jax.tree_util.tree_structure(opt_state) != (
            jax.tree_util.tree_structure(self.state.opt_state)
        ):
            print(
                "Optimizer state layout differs from this run's "
                "(pipeline_parallel changed?) — reinitializing optimizer."
            )
            opt_state = self.optimizer.init(
                jax.tree_util.tree_map(jnp.asarray, params)
            )
        state = TrainState(
            params=params,
            opt_state=opt_state,
            ema_params=ema if self.use_ema else None,
        )
        self.state = self._place_state(state)
        self.start_epoch = payload.get("epoch", 0) + 1
        self.best_loss = payload.get("best_loss", float("inf"))
        self.global_step = payload.get("global_step", 0)
        print(f"Resuming training from epoch {self.start_epoch}")
        if self.start_epoch > self.epochs:
            extend = self.config.get("epochs", 100)
            print(
                f"Checkpoint epoch ({self.start_epoch - 1}) is greater than "
                f"configured epochs ({self.epochs})."
            )
            print(f"Extending training by {extend} epochs...")
            self.epochs = self.start_epoch + extend
            print(f"New target epochs: {self.epochs}")

    # ----------------------------------------------------------------- loop
    def current_lr(self) -> float:
        count = self.global_step // max(1, self.accum)
        return float(self.lr_schedule(jnp.asarray(count)))

    def train(self):
        """Main loop (parity: trainer.py:367-416)."""
        if self.is_main_process:
            print(f"Starting training for {self.epochs} epochs")
            print(f"Mesh: {self.mesh} ({self.world_size} devices)")

        for epoch in range(self.start_epoch, self.epochs + 1):
            start_time = time.time()
            # jax.profiler trace of the first post-resume epoch when
            # config['profile_dir'] is set (SURVEY.md §5.1 rebuild)
            with profile_trace(
                self.profile_dir if epoch == self.start_epoch else None
            ):
                avg_loss = self.train_epoch(epoch)
            epoch_time = time.time() - start_time

            # failure detection (beyond the reference, SURVEY.md §5.3): a
            # non-finite epoch loss means diverged training — stop before
            # the checkpoint rotation overwrites the last good state.
            if not math.isfinite(avg_loss):
                print(
                    f"ERROR: non-finite loss ({avg_loss}) at epoch {epoch}; "
                    "stopping before overwriting checkpoints. Resume from "
                    f"{self.save_dir / 'current_model.ckpt'} with a lower "
                    "learning rate."
                )
                self.tracker.log({"train/diverged_epoch": epoch}, step=epoch)
                break

            if self.is_main_process:
                lr = self.current_lr()
                print(
                    f"Epoch {epoch}/{self.epochs} - Loss: {avg_loss:.4f} - "
                    f"LR: {lr:.6f} - Time: {epoch_time:.2f}s"
                )
                timing = {
                    f"train/step_{k}": v
                    for k, v in self.step_timer.summary().items()
                }
                self.step_timer.reset()
                self.tracker.log(
                    {
                        "train/loss": avg_loss,
                        "train/lr": lr,
                        "train/epoch_time": epoch_time,
                        **timing,
                    },
                    step=epoch,
                )

            is_best = avg_loss < self.best_loss
            if is_best:
                self.best_loss = avg_loss
            self.save_checkpoint(epoch, is_best, is_last=epoch == self.epochs)

            if (
                epoch >= self.sample_start_epoch
                and epoch % self.sample_interval == 0
            ):
                # ALL processes run the sampling computation (the params are
                # globally-replicated jax.Arrays — a rank-0-only jit would
                # deadlock multi-host); only rank 0 saves the grid (the
                # reference's rank-0 gate, trainer.py:409-411, moves inside).
                if self.is_main_process:
                    print(f"Generating samples at epoch {epoch}...")
                self.sample_images(epoch)

        if self.is_main_process:
            print("Training completed!")
            self.tracker.finish()

    def cleanup(self):
        """No process groups to tear down under JAX (trainer.py:418-421)."""

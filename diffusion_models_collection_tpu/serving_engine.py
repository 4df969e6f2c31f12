"""Continuous-batching serving engine (beyond the reference).

The reference (and `serve.py`'s default mode) serves whole sampler
trajectories per request: a request waits for the previous batch to run
all S denoising steps, then occupies the chip for S more. This engine
instead runs ONE jitted per-step program over a fixed pool of B slots,
where every slot carries its OWN grid position — the LLM-style
continuous-batching idea applied to diffusion:

- a new request is admitted into free slots at the next tick (latency
  to first compute ~1 step, not ~S steps);
- slots finishing step S deliver their image and free up immediately,
  so the chip never idles between requests under load;
- heterogeneous progress costs nothing extra on TPU: the denoiser and
  the DDIM update already take PER-SAMPLE timestep arrays (the batch
  simply contains mixed t values — one compiled program, static shapes).

Design (all device state, one tick = one XLA program):
    x      [B, H, W, C]  current latents/images per slot
    pos    [B] int32     grid index (0..S); S means done/idle
    y      [B] int32     label (+1 shifted; 0 = unconditional null)
    cfg    [B] f32       per-slot CFG scale (fused [cond; uncond] batch)
    active [B] bool      slot occupied

The update rule is deterministic DDIM (eta = 0), so each slot's
trajectory is bit-identical to `DDIM.sample`/`sample_with_cfg` with the
same init noise — slot independence and solo-vs-engine parity are
tested. Admission writes slots via donated `.at[idx].set` scatters
inside jit; the host thread only moves tiny [B] vectors per tick.
"""

from __future__ import annotations

import functools
import threading
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .diffusion import base
from .diffusion.ddim import ddim_step
from .diffusion.schedule import NoiseSchedule, ddim_timesteps


@functools.partial(
    jax.jit,
    static_argnames=("use_cfg", "clip_denoised", "p_threshold",
                     "guidance_rescale", "cfg_interval", "steps_per_tick"),
    donate_argnums=(1,),
)
def _tick(
    schedule: NoiseSchedule,
    x: jnp.ndarray,
    pos: jnp.ndarray,
    y: jnp.ndarray,
    cfg: jnp.ndarray,
    active: jnp.ndarray,
    grid: jnp.ndarray,
    model_fn,
    *,
    use_cfg: bool,
    clip_denoised: bool,
    p_threshold: Optional[float],
    guidance_rescale: float,
    cfg_interval,
    steps_per_tick: int = 1,
):
    """Advance every active, unfinished slot by `steps_per_tick` DDIM
    steps in ONE compiled program (fori_loop over the identical
    single-step body, so each slot's trajectory stays bit-identical to
    the scan sampler's; slots that finish mid-tick stop advancing)."""
    n_steps = grid.shape[0]

    def one_step(x, pos):
        idx = jnp.clip(pos, 0, n_steps - 1)
        t = grid[idx]
        # next grid time per slot; the final transition uses -1 (terminal
        # alpha_bar = 1 convention shared with the scan sampler)
        t_next = jnp.where(
            idx + 1 < n_steps, grid[jnp.clip(idx + 1, 0, n_steps - 1)], -1
        )

        if use_cfg:
            # the scan samplers' exact CFG path (fused [cond; uncond]
            # batch, guidance rescale, cfg interval), with a PER-SLOT
            # scale — the lerp/rescale/gate are all per-sample ops, so a
            # broadcastable [B, 1, 1, 1] scale composes for free
            s = cfg.reshape(-1, *((1,) * (x.ndim - 1)))
            eps, x0 = base.cfg_eps_x0(
                model_fn, x, t, y, s,
                guidance_rescale=guidance_rescale, schedule=schedule,
                cfg_interval=cfg_interval,
            )
            # CFG parity with DDIM.sample_with_cfg: dynamic thresholding
            # (reference ddim.py:299-327) when p_threshold is set
            x0 = base.constrain_x0(x0, p_threshold, clip_denoised)
        else:
            eps, x0 = model_fn(x, t, y)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)

        x_new = ddim_step(schedule, x, t, t_next, eps, x0, 0.0, None)
        running = active & (pos < n_steps)
        mask = running.reshape(-1, *((1,) * (x.ndim - 1)))
        x = jnp.where(mask, x_new, x)
        pos = jnp.where(running, pos + 1, pos)
        return x, pos

    if steps_per_tick == 1:
        return one_step(x, pos)
    return jax.lax.fori_loop(
        0, steps_per_tick, lambda _, c: one_step(*c), (x, pos)
    )


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
def _admit(x, pos, y, cfg, active, slots, noise, labels, scales):
    """Scatter fresh requests into free slots (donated state)."""
    x = x.at[slots].set(noise)
    pos = pos.at[slots].set(0)
    y = y.at[slots].set(labels)
    cfg = cfg.at[slots].set(scales)
    active = active.at[slots].set(True)
    return x, pos, y, cfg, active


# NOTE: there is deliberately NO per-completion device op. Retiring a
# slot used to scatter active[slots]=False and gather x[done_slots] —
# both compile PER DISTINCT slot-count, and under load the completion
# sizes vary (1..B), so the tunnel paid a multi-second remote compile
# for every new size (observed: 14 s p99 spikes mid-sweep). A finished
# slot is already inert in _tick (pos == n_steps gates `running`), so
# retirement is purely host-side bookkeeping and recycled slots are
# reactivated by _admit.


@dataclass
class _Request:
    noise: np.ndarray           # (k, H, W, C)
    labels: np.ndarray          # (k,) int32, already +1 shifted
    cfg_scale: float
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    slots: Optional[np.ndarray] = None
    error: Optional[Exception] = None
    cancelled: bool = False     # submit() timed out; drop on admission


class ContinuousBatchingEngine:
    """Slot-based stepwise DDIM engine; thread-safe `submit`.

    `model_fn` must be the (eps, x0) pair view (`base.wrap_model_as_eps_x0`
    over an eval-mode apply); params ride as jit-closure constants like
    everywhere else. The engine thread ticks only while slots are
    active, so an idle server burns no device time.
    """

    def __init__(
        self,
        schedule: NoiseSchedule,
        pair_fn,
        *,
        image_shape,             # (H, W, C)
        num_slots: int = 16,
        num_inference_steps: int = 50,
        num_timesteps: int = 1000,
        conditional: bool = False,
        clip_denoised: bool = True,
        p_threshold=base.AUTO_THRESHOLD,
        timesteps=None,
        guidance_rescale: float = 0.0,
        cfg_interval=None,
        steps_per_tick: int = 1,
    ):
        self.schedule = schedule
        self.pair_fn = pair_fn
        self.num_slots = int(num_slots)
        self.conditional = bool(conditional)
        self.clip_denoised = bool(clip_denoised)
        # same CFG-path default as the scan samplers: AUTO resolves to
        # 0.995 dynamic thresholding for pixel spaces, None for latent
        self.p_threshold = base.resolve_p_threshold(
            p_threshold, self.clip_denoised
        )
        self.guidance_rescale = base.validate_guidance_rescale(
            guidance_rescale
        )
        self.cfg_interval = base.validate_cfg_interval(
            cfg_interval, num_timesteps
        )
        # honor the sampler's grid (e.g. karras spacing) when given;
        # fall back to the uniform DDIM grid
        self.grid = jnp.asarray(
            timesteps if timesteps is not None
            else ddim_timesteps(num_timesteps, num_inference_steps),
            jnp.int32,
        )
        self.num_steps = int(self.grid.shape[0])
        # >1 amortizes the per-dispatch round-trip (decisive on the
        # tunneled runtime: ~7x engine overhead measured at 1) at the
        # cost of admission/completion granularity of k steps
        self.steps_per_tick = int(steps_per_tick)
        if not 1 <= self.steps_per_tick <= self.num_steps:
            raise ValueError(
                f"steps_per_tick must be in [1, {self.num_steps}], got "
                f"{steps_per_tick}"
            )
        h, w, c = image_shape
        self._x = jnp.zeros((self.num_slots, h, w, c), jnp.float32)
        # idle slots park at pos = S (finished)
        self._pos = jnp.full((self.num_slots,), self.num_steps, jnp.int32)
        # Host-side shadow of pos: advancement is deterministic (+k per
        # tick for active slots, clamped), so completion detection needs
        # NO per-tick device readback — the old [B] pos/active readbacks
        # were 2 tunnel round-trips per ~5 ms of compute and dominated
        # engine latency. The device pos stays authoritative for math;
        # the shadow only schedules readbacks of finished images.
        self._shadow_pos = np.full((self.num_slots,), self.num_steps,
                                   np.int64)
        self._y = jnp.zeros((self.num_slots,), jnp.int32)
        self._cfg = jnp.ones((self.num_slots,), jnp.float32)
        self._active = jnp.zeros((self.num_slots,), jnp.bool_)

        self._free = list(range(self.num_slots))
        self._pending: list[_Request] = []
        self._inflight: dict[int, _Request] = {}  # slot -> request
        self._lock = threading.Lock()
        self._work = threading.Event()
        self._stop = False
        self._error: Optional[Exception] = None  # engine-fatal failure
        self._thread: Optional[threading.Thread] = None
        self.ticks = 0          # observability: total device steps run

    # ------------------------------------------------------------- public
    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop = True
        self._work.set()
        if self._thread is not None:
            self._thread.join(timeout=30)

    def submit(self, noise: np.ndarray, labels=None,
               cfg_scale: float = 1.0, timeout: float = 300.0):
        """Block until the request's images are ready; returns
        (k, H, W, C) float32 model-space outputs (same convention as
        DDIM.sample). `noise` is the request's init noise (k, H, W, C);
        `labels` are +1-shifted ints or None (unconditional)."""
        if self._error is not None:
            raise RuntimeError(
                f"serving engine is dead: {self._error!r}"
            ) from self._error
        k = int(noise.shape[0])
        if k < 1 or k > self.num_slots:
            raise ValueError(f"request size must be in [1, {self.num_slots}]")
        if labels is None:
            labels = np.zeros((k,), np.int32)
        req = _Request(
            noise=np.asarray(noise, np.float32),
            labels=np.asarray(labels, np.int32),
            cfg_scale=float(cfg_scale),
        )
        with self._lock:
            self._pending.append(req)
        self._work.set()
        if not req.event.wait(timeout):
            # drop the abandoned request so it can't occupy slots later;
            # if it was already admitted, its slots finish and recycle
            with self._lock:
                req.cancelled = True
                if req in self._pending:
                    self._pending.remove(req)
            raise TimeoutError("generation timed out")
        if req.error is not None:
            raise req.error
        return req.result

    # -------------------------------------------------------------- loop
    def _try_admit_locked(self):
        """Assign free slots to pending requests (FIFO, all-or-nothing
        per request so one oversized request can't starve)."""
        admitted = []
        while self._pending and len(self._free) >= len(
            self._pending[0].labels
        ):
            req = self._pending.pop(0)
            if req.cancelled:  # submit() timed out while queued
                continue
            k = len(req.labels)
            slots = np.asarray([self._free.pop() for _ in range(k)],
                               np.int32)
            req.slots = slots
            for s in slots:
                self._inflight[int(s)] = req
            admitted.append(req)
        return admitted

    def _loop(self):
        try:
            self._loop_body()
        except Exception as e:  # engine-fatal: fail fast, loudly
            self._error = e
            with self._lock:
                doomed = list(self._inflight.values()) + self._pending
                self._inflight.clear()
                self._pending.clear()
            for req in {id(r): r for r in doomed}.values():
                req.error = RuntimeError(f"serving engine died: {e!r}")
                req.event.set()

    def _loop_body(self):
        use_cfg = self.conditional
        while not self._stop:
            with self._lock:
                admitted = self._try_admit_locked()
                have_work = bool(self._inflight)
            for req in admitted:
                # pad every admission to num_slots entries (duplicate
                # writes of identical values are harmless) so _admit
                # compiles exactly ONCE instead of once per request
                # size — same per-size remote-compile hazard as the
                # retired gather/scatter above
                k = len(req.slots)
                pad = self.num_slots - k
                slots = np.concatenate(
                    [req.slots, np.repeat(req.slots[:1], pad)]
                ).astype(np.int32)
                noise = np.concatenate(
                    [req.noise, np.repeat(req.noise[:1], pad, axis=0)]
                )
                labels = np.concatenate(
                    [req.labels, np.repeat(req.labels[:1], pad)]
                ).astype(np.int32)
                self._x, self._pos, self._y, self._cfg, self._active = (
                    _admit(
                        self._x, self._pos, self._y, self._cfg,
                        self._active, jnp.asarray(slots),
                        jnp.asarray(noise),
                        jnp.asarray(labels),
                        jnp.full((self.num_slots,), req.cfg_scale,
                                 jnp.float32),
                    )
                )
                self._shadow_pos[req.slots] = 0
            if not have_work:
                self._work.wait(timeout=0.1)
                self._work.clear()
                continue

            self._x, self._pos = _tick(
                self.schedule, self._x, self._pos, self._y, self._cfg,
                self._active, self.grid, self.pair_fn,
                use_cfg=use_cfg, clip_denoised=self.clip_denoised,
                p_threshold=self.p_threshold,
                guidance_rescale=self.guidance_rescale,
                cfg_interval=self.cfg_interval,
                steps_per_tick=self.steps_per_tick,
            )
            self.ticks += 1

            # NO per-tick device readback: the shadow advances exactly
            # as the device pos does (active slots +k, clamped), so
            # completion is detected host-side and the only transfers
            # are finished images below.
            running = np.zeros((self.num_slots,), bool)
            with self._lock:
                for s in self._inflight:
                    running[s] = True
            self._shadow_pos[running] = np.minimum(
                self._shadow_pos[running] + self.steps_per_tick,
                self.num_steps,
            )
            done_slots = np.nonzero(
                running & (self._shadow_pos >= self.num_steps))[0]
            if done_slots.size:
                finished: dict[int, _Request] = {}
                with self._lock:
                    for s in done_slots:
                        req = self._inflight.pop(int(s), None)
                        if req is not None:
                            finished[id(req)] = req
                # a request completes when ALL its slots are done
                # (same grid length -> they finish on the same tick).
                # Read back the WHOLE pool (one fixed-shape transfer,
                # ~200 KB at 16x32x32x3) and index host-side: a
                # x[done_slots] gather compiles per distinct count.
                images = np.asarray(self._x)
                with self._lock:
                    self._free.extend(int(s) for s in done_slots)
                for req in finished.values():
                    req.result = np.stack(
                        [images[int(s)] for s in req.slots]
                    )
                    req.event.set()

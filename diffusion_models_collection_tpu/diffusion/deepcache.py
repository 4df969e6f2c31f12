"""DeepCache (Ma et al. 2023) — cached-feature DDIM sampling for the UNet.

The UNet's deep (low-resolution) features change slowly along adjacent
denoising steps, while the shallow (high-resolution) features track the
noise level. DeepCache exploits this: every `interval`-th step runs the
full network and records the up-path feature entering the outermost
`depth` levels; the in-between steps recompute only those outer levels,
splicing the cached deep feature in place of the whole middle of the
network. Training-free and parameter-free — any existing UNet checkpoint
applies (models/unet.py `deepcache_mode`/`deepcache_depth` fields pin
module names so partial execution binds the same params).

TPU-native design (vs the paper's PyTorch implementation, which branches
per step in Python): the trajectory compiles to ONE `lax.scan` over
step CHUNKS — each chunk body is 1 full step + (interval - 1) shallow
steps, unrolled at trace time (interval is static and small), so there is
no data-dependent branching and the cache never crosses the scan carry
(it is regenerated at slot 0 of every chunk, living only inside the chunk
body where XLA can keep it in registers/VMEM). Grids whose length is not
a multiple of `interval` run their remainder as an unrolled tail chunk —
every compiled model evaluation is a real grid step.

CFG, dynamic thresholding, guidance rescale, cfg_interval, eta-noise and
v/x0 prediction all reuse the exact `base.cfg_eps_x0` /
`base.wrap_model_as_eps_x0` helpers the plain samplers use — the cache
rides through a trace-time capture, so `interval=1` (every step full) is
numerically identical to `DDIM.sample*`.

No reference counterpart (the reference has no training-free
acceleration); interval/depth trade speed against sample quality exactly
as in the paper.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from . import base
from .ddim import ddim_step


def _pair_from_raw(schedule, raw, x, t, prediction_type):
    """(eps, x0) conversion of an already-computed raw model output."""
    pair = base.wrap_model_as_eps_x0(
        schedule, lambda _x, _t, _y=None: raw, prediction_type
    )
    return pair(x, t, None)


def _cfg_with_cache(raw_call, x, t, y, cfg_scale, *, schedule,
                    prediction_type, guidance_rescale, cfg_interval):
    """`base.cfg_eps_x0` over a cache-carrying model call.

    `raw_call(x2, t2, y2) -> (raw, cache)` runs on the fused
    [cond; uncond] batch; the cache is captured at trace time so the
    guidance math stays byte-identical to the plain samplers'.
    """
    box = {}

    def pair_fn(x2, t2, y2):
        raw, box["cache"] = raw_call(x2, t2, y2)
        return _pair_from_raw(schedule, raw, x2, t2, prediction_type)

    eps, x0 = base.cfg_eps_x0(
        pair_fn, x, t, y, cfg_scale,
        guidance_rescale=guidance_rescale, schedule=schedule,
        cfg_interval=cfg_interval,
    )
    return eps, x0, box["cache"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "interval",
        "eta",
        "use_cfg",
        "p_threshold",
        "clip_denoised",
        "guidance_rescale",
        "cfg_interval",
        "prediction_type",
    ),
)
def _deepcache_scan(
    schedule,
    full_fn,
    shallow_fn,
    img: jnp.ndarray,
    timesteps: jnp.ndarray,
    t_next_seq: jnp.ndarray,
    rng: jax.Array,
    y: Optional[jnp.ndarray],
    cfg_scale: jnp.ndarray,
    *,
    interval: int,
    eta: float,
    use_cfg: bool,
    p_threshold: Optional[float],
    clip_denoised: bool,
    guidance_rescale: float,
    cfg_interval,
    prediction_type: str,
):
    steps = int(timesteps.shape[0])
    k = int(interval)
    # Full chunks scan; the remainder runs as an unrolled tail below so a
    # non-multiple grid never executes padded/masked shallow evaluations
    # (round-2 advisor finding: steps=4, interval=5 burned 4 discarded
    # shallow passes).
    chunks = steps // k
    rem = steps - chunks * k

    idx = jnp.arange(steps, dtype=jnp.int32)
    scan_ins = (
        timesteps[: chunks * k].reshape(chunks, k),
        t_next_seq[: chunks * k].reshape(chunks, k),
        idx[: chunks * k].reshape(chunks, k),
    )
    batch = img.shape[0]

    def model_step(img, t, cache):
        """One denoiser evaluation; `cache=None` means the full pass."""
        if cache is None:
            raw_call = full_fn
        else:
            def raw_call(x2, t2, y2):
                return shallow_fn(x2, t2, y2, cache), cache
        if use_cfg:
            eps, x0, cache = _cfg_with_cache(
                raw_call, img, t, y, cfg_scale, schedule=schedule,
                prediction_type=prediction_type,
                guidance_rescale=guidance_rescale,
                cfg_interval=cfg_interval,
            )
            x0 = base.constrain_x0(x0, p_threshold, clip_denoised)
        else:
            raw, cache = raw_call(img, t, y)
            eps, x0 = _pair_from_raw(
                schedule, raw, img, t, prediction_type
            )
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
        return eps, x0, cache

    def slot(img, s, t_s, tn_s, i_s, cache):
        """One DDIM step; s==0 runs the full network and refreshes the
        cache, s>0 replays the shallow levels against it."""
        t = jnp.full((batch,), t_s, jnp.int32)
        t_next = jnp.full((batch,), tn_s, jnp.int32)
        eps, x0, cache = model_step(img, t, None if s == 0 else cache)
        noise = (
            jax.random.normal(
                jax.random.fold_in(rng, i_s), img.shape, img.dtype
            )
            if eta > 0
            else None
        )
        img = ddim_step(schedule, img, t, t_next, eps, x0, eta, noise)
        return img, cache

    def chunk(img, ins):
        ts_c, tn_c, ii_c = ins
        cache = None  # slot 0 is always a full step
        for s in range(k):
            img, cache = slot(img, s, ts_c[s], tn_c[s], ii_c[s], cache)
        return img, None

    if chunks:
        img, _ = jax.lax.scan(chunk, img, scan_ins)
    # Unrolled tail: the last `rem` grid points (1 full + rem-1 shallow),
    # no masked no-op evaluations.
    cache = None
    for s in range(rem):
        j = chunks * k + s
        img, cache = slot(
            img, s, timesteps[j], t_next_seq[j], idx[j], cache
        )
    return img


def deepcache_sample(
    ddim,
    full_fn,
    shallow_fn,
    shape,
    rng,
    y=None,
    cfg_scale: Optional[float] = None,
    interval: int = 3,
    p_threshold=base.AUTO_THRESHOLD,
    init_noise=None,
):
    """Sample a full DDIM trajectory with DeepCache feature reuse.

    Args:
        ddim: a `DDIM` process (its grid, eta, clip/threshold, CFG knobs
            and prediction type are all honored).
        full_fn: `(x, t, y) -> (raw, cache)` — the checkpoint applied
            with `deepcache_mode='full'`.
        shallow_fn: `(x, t, y, cache) -> raw` — the same params applied
            with `deepcache_mode='shallow'` (same `deepcache_depth`).
        interval: cache refresh period; 1 reproduces plain DDIM exactly,
            larger is faster and coarser.
        cfg_scale: None for unguided sampling, else classifier-free
            guidance exactly as `DDIM.sample_with_cfg`.

    RNG layout matches `DDIM._run` (one init split, per-step fold on the
    global step index), so eta>0 trajectories line up with the plain
    sampler at interval=1 too.
    """
    interval = int(interval)
    if interval < 1:
        raise ValueError(f"interval must be >= 1, got {interval}")
    # interval beyond the grid length degenerates to "one full step then
    # all-shallow": clamp so the chunking below stays meaningful
    interval = min(interval, int(ddim.inference_timesteps.shape[0]))
    use_cfg = cfg_scale is not None
    if use_cfg and y is None:
        raise ValueError("CFG sampling requires class labels y.")

    rng, init_rng = jax.random.split(rng)
    img = (
        init_noise
        if init_noise is not None
        else jax.random.normal(init_rng, tuple(shape), jnp.float32)
    )
    timesteps = ddim.inference_timesteps
    t_next_seq = jnp.concatenate(
        [timesteps[1:], jnp.full((1,), -1, timesteps.dtype)]
    )
    return _deepcache_scan(
        ddim.schedule, full_fn, shallow_fn, img,
        timesteps.astype(jnp.int32), t_next_seq.astype(jnp.int32),
        rng,
        jnp.asarray(y) if y is not None else None,
        jnp.float32(cfg_scale if use_cfg else 0.0),
        interval=interval,
        eta=ddim.eta,
        use_cfg=use_cfg,
        p_threshold=(
            base.resolve_p_threshold(p_threshold, ddim.clip_sample)
            if use_cfg else None
        ),
        clip_denoised=ddim.clip_sample,
        guidance_rescale=ddim.guidance_rescale,
        cfg_interval=ddim.cfg_interval,
        prediction_type=ddim.prediction_type,
    )

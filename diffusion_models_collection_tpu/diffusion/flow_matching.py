"""Flow matching / rectified flow — deterministic ODE generative process.

Extension beyond the reference (which ships DDPM + DDIM only; reference
`diffusion/__init__.py:6-9`): conditional flow matching with the linear
(rectified-flow) interpolant (Lipman et al. 2023; Liu et al. 2023). The
network regresses the constant velocity of the straight path between data
and noise; sampling integrates the learned ODE from noise to data.

Math (linear interpolant, data x0, noise x1 ~ N(0, I)):
    x_tau  = (1 - tau) * x0 + tau * x1,          tau in [0, 1]
    target v = dx/dtau = x1 - x0                 (constant along the path)
    sampling: integrate dx/dtau = v(x, tau) from tau=1 (noise) to tau=0.

Discrete-time contract: models embed integer timesteps (same (x, t, y)
signature as every backbone here), so tau maps linearly onto the integer
grid, tau(t) = t / (num_timesteps - 1). Training draws t uniformly from
[0, T) exactly like the DDPM trainer loop (trainer.py draws ints); the
q_sample/p_losses/sample/sample_with_cfg surface matches DDPM/DDIM so the
trainer, CLIs, and serving path work unchanged via the
`diffusion_type: 'flow_matching'` config key.

TPU-native: the whole trajectory is one jitted `lax.scan` (segmented only
for host progress lines, like DDPM); CFG guides the velocity with the
fused [cond; uncond] batch; `solver='euler'` (1st order) or `'heun'`
(2nd-order predictor-corrector, 2 model calls/step).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from . import base

VALID_FLOW_SOLVERS = ("euler", "heun")


def interpolate(x_start, tau, noise):
    """x_tau on the straight data->noise path; tau broadcast per-sample."""
    tau = tau.reshape(-1, *((1,) * (x_start.ndim - 1)))
    return (1.0 - tau) * x_start + tau * noise


def _cfg_velocity(model_fn, x, t, y, cfg_scale):
    """Classifier-free-guided velocity, fused [cond; uncond] batch.

    Guidance is linear, so guiding velocities equals guiding the implied
    eps/x0 — same commutation argument as `base.cfg_eps`.
    """
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    y2 = jnp.concatenate([y, jnp.zeros_like(y)], axis=0)
    v2 = model_fn(x2, t2, y2)
    v_cond, v_uncond = jnp.split(v2, 2, axis=0)
    return v_uncond + cfg_scale * (v_cond - v_uncond)


def _constrained_velocity(x, tau, v, p_threshold, clip_denoised):
    """Apply the x0 constraint (threshold/clip) in velocity space.

    x0 implied by a velocity at (x, tau) is x0 = x - tau * v; constraining
    x0 and mapping back gives v' = (x - x0') / tau. Skipped where tau ~ 0
    (x IS x0 there; the division would blow up).
    """
    if p_threshold is None and not clip_denoised:
        return v
    taub = tau.reshape(-1, *((1,) * (x.ndim - 1)))
    x0 = x - taub * v
    x0c = (
        base.apply_x0_constraint(x0, p_threshold)
        if p_threshold is not None
        else jnp.clip(x0, -1.0, 1.0)
    )
    safe = taub > 1e-4
    v_new = (x - x0c) / jnp.where(safe, taub, 1.0)
    return jnp.where(safe, v_new, v)


@functools.partial(
    jax.jit,
    static_argnames=(
        "solver", "use_cfg", "p_threshold", "clip_denoised",
        "return_all_timesteps",
    ),
)
def _scan_segment(
    model_fn,
    img: jnp.ndarray,
    taus,  # (S, 2) float32 [tau, tau_next] rows for this segment
    y: Optional[jnp.ndarray],
    cfg_scale: jnp.ndarray,
    num_timesteps: int,
    known=None,  # (known_x0, mask, eps0): inpainting projection (ODE —
    #             the kept region rides the deterministic interpolant
    #             (1-tau)*known + tau*eps0 for one fixed noise draw)
    *,
    solver: str,
    use_cfg: bool,
    p_threshold: Optional[float],
    clip_denoised: bool,
    return_all_timesteps: bool,
):
    batch = img.shape[0]
    t_max = num_timesteps - 1

    def velocity(x, tau_scalar):
        t = jnp.full(
            (batch,),
            jnp.round(tau_scalar * t_max).astype(jnp.int32),
            dtype=jnp.int32,
        )
        tau = jnp.full((batch,), tau_scalar, dtype=jnp.float32)
        if use_cfg:
            v = _cfg_velocity(model_fn, x, t, y, cfg_scale)
        else:
            v = model_fn(x, t, y)
        return _constrained_velocity(x, tau, v, p_threshold, clip_denoised)

    def step(carry, tau_pair):
        x = carry
        tau, tau_next = tau_pair[0], tau_pair[1]
        dt = tau_next - tau  # negative: integrating noise -> data
        v1 = velocity(x, tau)
        if solver == "heun":
            # first-order FINAL step (lower_order_final, as in DPM++ and
            # EDM): the corrector would evaluate the field at tau = 0,
            # where marginal velocities are 1/tau-singular.
            x_pred = x + dt * v1
            v2 = velocity(x_pred, tau_next)
            x_heun = x + dt * 0.5 * (v1 + v2)
            x = jnp.where(tau_next > 1e-6, x_heun, x_pred)
        else:
            x = x + dt * v1
        if known is not None:
            known_x0, mask, eps0 = known
            x_known = (1.0 - tau_next) * known_x0 + tau_next * eps0
            x = mask * x + (1.0 - mask) * x_known
        return x, (x if return_all_timesteps else None)

    return jax.lax.scan(step, img, taus)


class FlowMatching:
    """Rectified-flow process with the DDPM/DDIM API surface.

    Drop-in for the trainer/CLIs/serving: `q_sample` is the linear
    interpolant, `p_losses` the velocity regression, `sample`/
    `sample_with_cfg` integrate the ODE (deterministic given init noise).
    """

    def __init__(
        self,
        num_timesteps: int = 1000,
        num_inference_steps: int = 50,
        solver: str = "euler",
        clip_sample: bool = True,
    ):
        if solver not in VALID_FLOW_SOLVERS:
            raise ValueError(
                f"Unknown flow solver: {solver!r} "
                f"(expected one of {VALID_FLOW_SOLVERS})"
            )
        if num_timesteps < 2:
            raise ValueError("flow matching needs num_timesteps >= 2")
        self.num_timesteps = num_timesteps
        self.num_inference_steps = num_inference_steps
        self.solver = solver
        # False for unbounded prediction spaces (latent diffusion)
        self.clip_sample = bool(clip_sample)
        # the velocity target is parameterization-complete already
        self.prediction_type = "v_flow"

    def set_inference_steps(self, num_inference_steps: int):
        """Update the ODE step count (API parity with DDIM)."""
        self.num_inference_steps = int(num_inference_steps)

    def tau_of_t(self, t):
        """Continuous path position for integer timesteps."""
        return t.astype(jnp.float32) / float(self.num_timesteps - 1)

    # -- training-side API ---------------------------------------------------
    def q_sample(self, x_start, t, noise):
        """Forward corruption = linear interpolation toward noise."""
        return interpolate(x_start, self.tau_of_t(t), noise)

    def p_losses(self, model_fn, x_start, t, noise, y=None, loss_type="l2"):
        """Conditional flow-matching loss: regress v = noise - x_start."""
        x_t = self.q_sample(x_start, t, noise)
        v_pred = model_fn(x_t, t, y)
        return base.diffusion_loss(noise - x_start, v_pred, loss_type)

    # -- whole-trajectory samplers --------------------------------------------
    def _taus(self):
        """tau grid 1 -> 0, packed as (S, 2) [tau_i, tau_{i+1}] rows."""
        grid = jnp.linspace(1.0, 0.0, self.num_inference_steps + 1)
        return jnp.stack([grid[:-1], grid[1:]], axis=1).astype(jnp.float32)

    def _run(self, model_fn, shape, rng, y, cfg_scale, init_noise, *,
             use_cfg, p_threshold, clip_denoised, return_all_timesteps,
             progress, desc, taus=None, start_img=None, known=None):
        from .ddpm import _run_segments  # shared progress segmentation

        rng, init_rng = jax.random.split(rng)
        if start_img is not None:
            img = start_img
        else:
            img = (
                init_noise
                if init_noise is not None
                else jax.random.normal(init_rng, tuple(shape), dtype=jnp.float32)
            )
        fn = base.as_pytree_fn(model_fn)

        def segment(img, taus_seg):
            return _scan_segment(
                fn, img, taus_seg, y, cfg_scale, self.num_timesteps, known,
                solver=self.solver, use_cfg=use_cfg,
                p_threshold=p_threshold, clip_denoised=clip_denoised,
                return_all_timesteps=return_all_timesteps,
            )

        if taus is None:
            taus = self._taus()
        return _run_segments(
            segment, img, taus, return_all_timesteps, progress, desc
        )

    def sample(self, model_fn, shape, rng, y=None, return_all_timesteps=False,
               init_noise=None, progress=False):
        return self._run(
            model_fn, shape, rng, y, jnp.float32(0.0), init_noise,
            use_cfg=False, p_threshold=None,
            clip_denoised=self.clip_sample,
            return_all_timesteps=return_all_timesteps, progress=progress,
            desc=f"Flow sampling ({self.solver})",
        )

    def sample_with_cfg(
        self,
        model_fn,
        shape,
        y,
        rng,
        cfg_scale: float = 3.0,
        p_threshold=base.AUTO_THRESHOLD,
        return_all_timesteps: bool = False,
        init_noise=None,
        progress: bool = False,
    ):
        if y is None:
            raise ValueError("CFG sampling requires class labels y.")
        p_threshold = base.resolve_p_threshold(p_threshold, self.clip_sample)
        return self._run(
            model_fn, shape, rng, jnp.asarray(y), jnp.float32(cfg_scale),
            init_noise, use_cfg=True, p_threshold=p_threshold,
            clip_denoised=self.clip_sample,
            return_all_timesteps=return_all_timesteps,
            progress=progress,
            desc=f"Flow sampling ({self.solver}) with CFG scale {cfg_scale}",
        )

    def img2img(
        self,
        model_fn,
        init_image,
        rng,
        strength: float = 0.8,
        y=None,
        cfg_scale: Optional[float] = None,
        p_threshold=base.AUTO_THRESHOLD,
        mask=None,
        return_all_timesteps: bool = False,
        progress: bool = False,
    ):
        """SDEdit image-to-image + optional inpainting on the flow ODE
        (extension; see DDPM.img2img for the shared semantics).

        Starts at tau0 = strength on the interpolant toward ONE fixed
        noise draw and integrates back to tau = 0; the step count scales
        with strength (ceil(strength * num_inference_steps)). With a
        mask, kept pixels ride the deterministic interpolant of the same
        noise draw, ending exactly at the original values.
        """
        if not (0.0 <= float(strength) <= 1.0):
            raise ValueError("strength must be in [0, 1]")
        init_image = jnp.asarray(init_image, jnp.float32)
        import math

        tau0 = float(strength)
        if tau0 <= 0.0:
            return init_image
        n_steps = max(1, math.ceil(tau0 * self.num_inference_steps))
        rng, noise_rng = jax.random.split(rng)
        eps0 = jax.random.normal(noise_rng, init_image.shape, jnp.float32)
        start_img = (1.0 - tau0) * init_image + tau0 * eps0
        known = None
        if mask is not None:
            mask_b = jnp.broadcast_to(
                jnp.asarray(mask, jnp.float32), init_image.shape
            )
            known = (init_image, mask_b, eps0)
        grid = jnp.linspace(tau0, 0.0, n_steps + 1)
        taus = jnp.stack([grid[:-1], grid[1:]], axis=1).astype(jnp.float32)
        use_cfg = cfg_scale is not None
        if use_cfg and y is None:
            raise ValueError("CFG img2img requires class labels y.")
        return self._run(
            model_fn, init_image.shape, rng,
            jnp.asarray(y) if use_cfg else y,
            jnp.float32(cfg_scale if use_cfg else 0.0), None,
            use_cfg=use_cfg,
            p_threshold=(
                base.resolve_p_threshold(p_threshold, self.clip_sample)
                if use_cfg else None
            ),
            clip_denoised=self.clip_sample,
            return_all_timesteps=return_all_timesteps, progress=progress,
            desc=f"Flow img2img ({self.solver}, strength {strength})",
            taus=taus, start_img=start_img, known=known,
        )

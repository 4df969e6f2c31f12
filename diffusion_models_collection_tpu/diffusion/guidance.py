"""Classifier guidance (extension — Dhariwal & Nichol 2021 Alg. 2; the
reference implements classifier-FREE guidance only).

Sampling-time guidance from a noise-conditional classifier
(models/classifier.py): the eps prediction is shifted by the classifier's
score,

    eps'(x_t, t) = eps(x_t, t) - s * sqrt(1 - acp_t) * grad_x log p(y | x_t, t)

which is exactly sampling from p(x) * p(y|x)^s. Implemented as a wrapper
over the model CALLABLE — the same composition point as CFG fusion and
the SR conditioning (utils/sr.py) — so every VP sampler (DDPM ancestral,
DDIM, DPM-Solver++, UniPC) is guided without sampler changes, and the
classifier gradient (one jax.grad inside the trajectory scan) fuses into
the compiled step.

Defined on the eps parameterization of the VP family: `factory` rejects
it for v/x0-predicting models and for flow/EDM/consistency checkpoints
(their model outputs are not eps, so the score shift above would be
applied in the wrong space).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .schedule import NoiseSchedule, extract


def _guided_call(model_fn, classifier_fn, labels, scale, schedule,
                 x, t, y):
    eps = model_fn(x, t, y)
    b = labels.shape[0]
    reps = 1
    if x.shape[0] != b:
        # fused-CFG batch: the samplers build it as [x ; x] (base.
        # cfg_eps_x0 duplicates the SAME images for the cond/uncond
        # branches), so the classifier gradient is computed ONCE on the
        # first B rows and tiled — halving classifier cost per step.
        if x.shape[0] % b:
            raise ValueError(
                f"model batch {x.shape[0]} is not a multiple of the "
                f"guidance-label batch {b}"
            )
        reps = x.shape[0] // b
    x_b, t_b = x[:b], t[:b]

    def log_prob(xx):
        logits = classifier_fn(xx, t_b)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)
        return jnp.sum(picked)

    grad = jax.grad(log_prob)(x_b)
    if reps > 1:
        grad = jnp.concatenate([grad] * reps, axis=0)
    s = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x.ndim)
    return eps - scale * s * grad


def classifier_guided_model_fn(
    model_fn,
    classifier_fn,
    labels,
    scale,
    schedule: NoiseSchedule,
):
    """Wrap an eps-predicting `(x, t, y) -> eps` denoiser with classifier
    guidance toward `labels` (raw 0..K-1 ints, one per sample — NOT the
    +1-shifted CFG labels) at strength `scale`.

    `labels` and `scale` ride as traced `tree_util.Partial` args, so
    per-batch labels / runtime scale changes never retrace the jitted
    trajectory scans.

    Batch contract: calls at `len(labels)` rows guide each row; calls at
    an integer multiple (the samplers' fused-CFG `[x ; x]` batch) assume
    the halves are DUPLICATES of the same images — the gradient is
    computed once on the first B rows and tiled.
    """
    labels = jnp.asarray(labels, jnp.int32)
    if labels.ndim != 1:
        raise ValueError("guidance labels must be a 1-D int array")
    return jax.tree_util.Partial(
        _guided_call, model_fn, classifier_fn, labels,
        jnp.float32(scale), schedule,
    )

"""Perturbed Attention Guidance (extension — Ahn et al. 2024 "Self-
Rectifying Diffusion Sampling with Perturbed-Attention Guidance"; the
reference implements classifier-free guidance only).

Training-free, label-free sampling guidance: run the SAME checkpoint
twice per step — once normal, once with every self-attention map
replaced by the identity (each token attends only itself, so the
attention output is v; `pag_perturb` on models/unet.py AttentionBlock
and models/dit.py SelfAttention) — and extrapolate away from the
degraded prediction:

    eps'(x_t, t) = eps(x_t, t) + s * (eps(x_t, t) - eps_perturbed(x_t, t))

Because the degradation needs no labels, PAG improves UNCONDITIONAL
sampling too (CFG cannot), and it stacks with CFG: the wrapper sits at
the model-callable seam (the same composition point as CFG fusion,
classifier guidance and SR conditioning), so on a fused-CFG 2B batch
both branches are rectified before the CFG combine — the paper's
eps_cond + s_cfg(...) + s_pag(...) form, extended to also rectify the
unconditional branch.

Both forwards fuse into one compiled trajectory step (the perturbed
model shares the params as jit constants; its attention is CHEAPER than
the normal one). Defined on the eps parameterization of the VP family,
like classifier guidance — sample.py rejects flow/EDM/consistency and
v/x0 checkpoints.
"""

from __future__ import annotations

import jax


def pag_model_fn(model_fn, perturbed_fn, scale: float):
    """Wrap `(x, t, y) -> eps` callables into the PAG-rectified one.

    `perturbed_fn` must be the SAME weights applied through the
    pag_perturb=True variant of the model (factory builds it from the
    checkpoint config; the param tree is identical)."""
    s = float(scale)

    def fn(x, t, y=None):
        eps = model_fn(x, t, y)
        eps_p = perturbed_fn(x, t, y)
        return eps + s * (eps - eps_p)

    return jax.tree_util.Partial(fn)

"""Pallas kernel parity vs XLA references, in interpret mode on CPU
(SURVEY.md §7.8: every kernel lands with a numerical-parity test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from diffusion_models_collection_tpu.ops import selective_scan_pallas as ssp
from diffusion_models_collection_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_sequential,
)


def _scan_inputs(b, L, d, n, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (b, L, d))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (b, L, d)))
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)))
    B = jax.random.normal(ks[3], (b, L, n))
    C = jax.random.normal(ks[4], (b, L, n))
    D = jnp.ones((d,))
    return x, dt, A, B, C, D


def test_selective_scan_kernel_parity_interpret():
    x, dt, A, B, C, D = _scan_inputs(2, 32, 128, 8)
    assert ssp.supported(x, A)
    with pltpu.force_tpu_interpret_mode():
        y_pal = ssp.selective_scan_pallas(x, dt, A, B, C, D)
    y_ref = selective_scan_sequential(x, dt, A, B, C, D)
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-4, atol=1e-4)


def test_selective_scan_kernel_shape_gate():
    x, dt, A, B, C, D = _scan_inputs(1, 16, 100, 8)  # 100 not lane-aligned
    assert not ssp.supported(x, A)


def test_selective_scan_grad_matches_sequential():
    """custom_vjp backward (recompute path) vs autodiff of the sequential
    reference."""
    x, dt, A, B, C, D = _scan_inputs(1, 16, 4, 3)

    def loss_disp(args):
        return jnp.sum(selective_scan(*args) ** 2)

    def loss_seq(args):
        return jnp.sum(selective_scan_sequential(*args) ** 2)

    args = (x, dt, A, B, C, D)
    g_disp = jax.grad(loss_disp)(args)
    g_seq = jax.grad(loss_seq)(args)
    for a, b in zip(g_disp, g_seq):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_flash_attention_kernel_parity_interpret():
    from diffusion_models_collection_tpu.ops import flash_attention as fa

    rng = jax.random.PRNGKey(0)
    q, k, v = jax.random.normal(rng, (3, 2, 2, 256, 128))
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(q, k, v)
    assert out is not None
    scale = 1.0 / np.sqrt(128)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    expected = jnp.einsum(
        "bhqk,bhkd->bhqd", jax.nn.softmax(logits, axis=-1), v
    )
    np.testing.assert_allclose(out, expected, rtol=2e-2, atol=2e-3)


def test_flash_attention_shape_gate():
    from diffusion_models_collection_tpu.ops import flash_attention as fa

    rng = jax.random.PRNGKey(0)
    q, k, v = jax.random.normal(rng, (3, 1, 2, 64, 128))  # too short
    assert fa.flash_attention(q, k, v) is None
    # L=384 is 128-aligned but NOT divisible by the 256 block: the grid
    # would drop rows 256-383 and normalize over 256 keys — must fall
    # back to XLA, never compute silently wrong attention (regression:
    # round-2 review)
    assert not fa.supported(384, 64)
    q, k, v = jax.random.normal(rng, (3, 1, 2, 384, 64))
    assert fa.flash_attention(q, k, v) is None
    assert fa.supported(512, 64)  # multiples of the block stay eligible


def test_fused_group_norm_silu_parity():
    """Pallas GN+SiLU vs XLA reference vs flax GroupNorm (interpret mode)."""
    from flax import linen as nn

    from diffusion_models_collection_tpu.ops.fused_norm import (
        _gn_silu_pallas,
        group_norm_silu_xla,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 128))
    scale = jax.random.normal(jax.random.PRNGKey(1), (128,)) * 0.1 + 1
    bias = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1
    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5)
    ref = nn.silu(gn.apply({"params": {"scale": scale, "bias": bias}}, x))
    ours = group_norm_silu_xla(x, scale, bias, 8)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
    with pltpu.force_tpu_interpret_mode():
        pal = _gn_silu_pallas(x.reshape(2, 64, 128), scale, bias, 8)
    np.testing.assert_allclose(
        pal.reshape(2, 8, 8, 128), ours, rtol=1e-4, atol=1e-4
    )


def test_fused_group_norm_silu_grad():
    """custom_vjp backward matches autodiff of the XLA reference."""
    from diffusion_models_collection_tpu.ops.fused_norm import (
        group_norm_silu,
        group_norm_silu_xla,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 16))
    scale = jnp.ones((16,)) * 1.1
    bias = jnp.zeros((16,)) + 0.1

    g1 = jax.grad(lambda *a: jnp.sum(group_norm_silu(*a, 8) ** 2), (0, 1, 2))(
        x, scale, bias
    )
    g2 = jax.grad(
        lambda *a: jnp.sum(group_norm_silu_xla(*a, 8) ** 2), (0, 1, 2)
    )(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_selective_scan_bwd_kernel_parity_interpret():
    """Pallas backward kernel vs autodiff of the sequential reference."""
    b, L, d, n = 2, 32, 128, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, L, d))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (b, L, d)))
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)))
    B = jax.random.normal(ks[3], (b, L, n))
    C = jax.random.normal(ks[4], (b, L, n))
    g = jax.random.normal(ks[5], (b, L, d))

    def loss(args):
        return jnp.sum(selective_scan_sequential(*args, None) * g)

    gref = jax.grad(loss)((x, dt, A, B, C))
    with pltpu.force_tpu_interpret_mode():
        outs = ssp.selective_scan_bwd_pallas(x, dt, A, B, C, g)
    for a, r in zip(outs, gref):
        np.testing.assert_allclose(a, r, rtol=1e-4, atol=1e-4)


def test_selective_scan_bwd_from_ckpt_parity_interpret():
    """Forward-saved boundary checkpoints + phase-1-free backward kernel
    match autodiff of the sequential reference (and the ckpt forward's y
    matches the plain kernel)."""
    b, L, d, n = 2, 32, 128, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    x = jax.random.normal(ks[0], (b, L, d))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (b, L, d)))
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)))
    B = jax.random.normal(ks[3], (b, L, n))
    C = jax.random.normal(ks[4], (b, L, n))
    g = jax.random.normal(ks[5], (b, L, d))

    def loss(args):
        return jnp.sum(selective_scan_sequential(*args, None) * g)

    gref = jax.grad(loss)((x, dt, A, B, C))
    with pltpu.force_tpu_interpret_mode():
        y_plain = ssp.selective_scan_pallas(x, dt, A, B, C, None)
        y_ckpt, bound = ssp.selective_scan_fwd_ckpt_pallas(x, dt, A, B, C)
        outs = ssp.selective_scan_bwd_from_ckpt_pallas(
            x, dt, A, B, C, g, bound
        )
    np.testing.assert_allclose(y_ckpt, y_plain, rtol=1e-5, atol=1e-5)
    assert bound.shape == (b, L // ssp.t_block_for(L), n, d)
    for a, r in zip(outs, gref):
        np.testing.assert_allclose(a, r, rtol=1e-4, atol=1e-4)


def test_flash_attention_small_head_dim_parity():
    """head_dim 64/32 (the shipped DiT/UNet shapes — round-1 gate made
    these fall back to XLA) match the exact softmax formulation."""
    from diffusion_models_collection_tpu.ops import flash_attention as fa

    for head_dim in (64, 32):
        q, k, v = jax.random.normal(
            jax.random.PRNGKey(head_dim), (3, 2, 3, 256, head_dim)
        )
        with pltpu.force_tpu_interpret_mode():
            out = fa.flash_attention(q, k, v)
        assert out is not None
        scale = 1.0 / np.sqrt(head_dim)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        expected = jnp.einsum(
            "bhqk,bhkd->bhqd", jax.nn.softmax(logits, axis=-1), v
        )
        np.testing.assert_allclose(out, expected, rtol=2e-2, atol=2e-3)


def test_flash_attention_backward_parity():
    """The custom_vjp flash backward (and the long-sequence jnp fallback)
    match autodiff gradients of the exact formulation."""
    from diffusion_models_collection_tpu.ops import flash_attention as fa

    q, k, v = jax.random.normal(jax.random.PRNGKey(7), (3, 2, 2, 256, 64))
    tgt = jax.random.normal(jax.random.PRNGKey(8), (2, 2, 256, 64))

    def loss_flash(args):
        out = fa.flash_attention(*args)
        return jnp.mean((out - tgt) ** 2)

    def loss_ref(args):
        qq, kk, vv = args
        scale = 1.0 / np.sqrt(qq.shape[-1])
        logits = jnp.einsum("bhqd,bhkd->bhqk", qq, kk) * scale
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", jax.nn.softmax(logits, axis=-1), vv
        )
        return jnp.mean((out - tgt) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash)((q, k, v))
    g_ref = jax.grad(loss_ref)((q, k, v))
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)

    # jnp fallback path (sequences beyond the one-program backward limit)
    flat = tuple(t.reshape(4, 256, 64) for t in (q, k, v))
    with pltpu.force_tpu_interpret_mode():
        o, lse = fa._flash_fwd_bh(*flat, 256, 256)
        do = jnp.ones_like(o)
        dq2, dk2, dv2 = fa._flash_bwd_bh(*flat, o, do, lse)
    dq1, dk1, dv1 = fa._bwd_jnp(*flat, o, do, lse)
    np.testing.assert_allclose(dq1, dq2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dk1, dk2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dv1, dv2, rtol=1e-4, atol=1e-5)


def test_flash_attention_is_opt_in(monkeypatch):
    """The dispatch layer must NOT route to the flash kernel unless
    DMC_TPU_FLASH_ATTENTION=1 (end-to-end it loses at shipped shapes —
    docs/benchmarks.md)."""
    import diffusion_models_collection_tpu.ops.attention as attn_mod
    from diffusion_models_collection_tpu.ops import dispatch

    calls = []
    import diffusion_models_collection_tpu.ops.flash_attention as fa

    real = fa.flash_attention
    monkeypatch.setattr(
        fa, "flash_attention",
        lambda *a: calls.append(1) or real(*a),
    )
    q, k, v = jax.random.normal(jax.random.PRNGKey(0), (3, 1, 2, 256, 64))
    with dispatch.use_pallas(True), pltpu.force_tpu_interpret_mode():
        monkeypatch.delenv("DMC_TPU_FLASH_ATTENTION", raising=False)
        attn_mod.dot_product_attention(q, k, v)
        assert not calls, "flash ran without the opt-in env"
        monkeypatch.setenv("DMC_TPU_FLASH_ATTENTION", "1")
        attn_mod.dot_product_attention(q, k, v)
        assert calls, "opt-in env did not enable flash"


def test_selective_scan_grid_over_l_parity():
    """Grid-over-L pipelined fwd/bwd kernels match the fori_loop variants
    (same math, different pipelining) in interpret mode."""
    from diffusion_models_collection_tpu.ops import selective_scan_pallas as ssp

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    B_, L, D, N = 3, 64, 128, 8
    x = jax.random.normal(ks[0], (B_, L, D))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (B_, L, D)) - 1)
    A = -jnp.exp(jax.random.normal(ks[2], (D, N)))
    Bm = jax.random.normal(ks[3], (B_, L, N))
    Cm = jax.random.normal(ks[4], (B_, L, N))
    g = jax.random.normal(ks[5], (B_, L, D))
    with pltpu.force_tpu_interpret_mode():
        y1, bound1 = ssp.selective_scan_fwd_ckpt_pallas(x, dt, A, Bm, Cm)
        y2, bound2 = ssp.selective_scan_fwd_ckpt_pallas_grid(x, dt, A, Bm, Cm)
        np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(bound1, bound2, rtol=1e-5, atol=1e-6)
        g1 = ssp.selective_scan_bwd_from_ckpt_pallas(
            x, dt, A, Bm, Cm, g, bound1)
        g2 = ssp.selective_scan_bwd_from_ckpt_pallas_grid(
            x, dt, A, Bm, Cm, g, bound2)
        for i, (a, b) in enumerate(zip(g1, g2)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5,
                                       err_msg=f"grad output {i}")

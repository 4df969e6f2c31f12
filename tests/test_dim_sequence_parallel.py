"""DiM sequence parallelism (extension — SURVEY.md §2.3 lists none in the
reference): the Mamba selective scan DISTRIBUTED over a 'seq' mesh axis
(local associative scans + one all_gather of per-shard state summaries +
a halo'd causal conv). Equivalence vs the unsharded DiM on the 8-device
virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diffusion_models_collection_tpu.models import DiM
from diffusion_models_collection_tpu.ops.selective_scan import (
    selective_scan_xla,
)
from diffusion_models_collection_tpu.parallel import mesh as pmesh
from diffusion_models_collection_tpu.parallel.dim_sequence_parallel import (
    data_seq_mesh,
    distributed_selective_scan,
    make_dim_sequence_parallel_apply,
)



def _setup(dropout=0.0, remat=False):
    model = DiM(img_size=(8, 8), patch_size=2, in_channels=3, hidden_size=32,
                depth=2, state_size=4, num_classes=10, dropout=dropout,
                remat=remat)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 3))
    t = jnp.arange(8) % 10
    y = (jnp.arange(8) % 10) + 1
    params = model.init(jax.random.PRNGKey(1), x, t, y)["params"]
    # adaLN-Zero: fresh params output exactly 0 — perturb for signal
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(
            jax.random.PRNGKey(99), p.shape, p.dtype),
        params,
    )
    return model, params, x, t, y


def _place(mesh, params, *batch):
    sharding = NamedSharding(mesh, P("data"))
    return (pmesh.replicate(mesh, params),
            *(jax.device_put(a, sharding) for a in batch))


# ----------------------------------------------- distributed scan unit test
@pytest.mark.parametrize("sp", [2, 4, 8])
def test_distributed_scan_matches_xla(sp):
    """Local-prefix + carried-summary regrouping == the single-device
    associative scan (same math, different association)."""
    rng = np.random.default_rng(0)
    batch, L, d_inner, n = 2, 16, 8, 4
    x = jnp.asarray(rng.standard_normal((batch, L, d_inner)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.01, 0.2, (batch, L, d_inner)), jnp.float32)
    A = -jnp.asarray(rng.uniform(0.5, 2.0, (d_inner, n)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((batch, L, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((batch, L, n)), jnp.float32)
    D = jnp.asarray(rng.standard_normal((d_inner,)), jnp.float32)

    ref = selective_scan_xla(x, dt, A, B, C, D)

    mesh = data_seq_mesh(1, sp)
    fn = jax.shard_map(
        lambda *a: distributed_selective_scan(*a, axis="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(), P(None, "seq"),
                  P(None, "seq"), P()),
        out_specs=P(None, "seq"),
        check_vma=False,
    )
    out = fn(x, dt, A, B, C, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_distributed_scan_grads_match_xla():
    rng = np.random.default_rng(1)
    batch, L, d_inner, n = 1, 8, 4, 2
    args = (
        jnp.asarray(rng.standard_normal((batch, L, d_inner)), jnp.float32),
        jnp.asarray(rng.uniform(0.01, 0.2, (batch, L, d_inner)), jnp.float32),
        -jnp.asarray(rng.uniform(0.5, 2.0, (d_inner, n)), jnp.float32),
        jnp.asarray(rng.standard_normal((batch, L, n)), jnp.float32),
        jnp.asarray(rng.standard_normal((batch, L, n)), jnp.float32),
        jnp.asarray(rng.standard_normal((d_inner,)), jnp.float32),
    )
    mesh = data_seq_mesh(1, 4)
    fn = jax.shard_map(
        lambda *a: distributed_selective_scan(*a, axis="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(), P(None, "seq"),
                  P(None, "seq"), P()),
        out_specs=P(None, "seq"),
        check_vma=False,
    )
    g_sp = jax.jit(jax.grad(lambda *a: jnp.sum(fn(*a) ** 2),
                            argnums=(0, 1, 2, 3, 4, 5)))(*args)
    g_ref = jax.grad(
        lambda *a: jnp.sum(selective_scan_xla(*a) ** 2),
        argnums=(0, 1, 2, 3, 4, 5),
    )(*args)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


# --------------------------------------------------------- full model tests
@pytest.mark.parametrize("dp,sp", [(1, 2), (2, 4), (1, 4)])
def test_dim_sp_forward_matches_unsharded(dp, sp):
    model, params, x, t, y = _setup()
    ref = model.apply({"params": params}, x, t, y, train=False)
    mesh = data_seq_mesh(dp, sp)
    apply_fn = make_dim_sequence_parallel_apply(model, mesh)
    pr, xs, ts, ys = _place(mesh, params, x, t, y)
    out = apply_fn(pr, xs, ts, ys, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dim_sp_grads_match_unsharded():
    model, params, x, t, y = _setup()
    tgt = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    mesh = data_seq_mesh(2, 4)
    apply_fn = make_dim_sequence_parallel_apply(model, mesh)
    pr, xs, ts, ys, tgts = _place(mesh, params, x, t, y, tgt)

    g_sp = jax.jit(jax.grad(
        lambda p: jnp.mean((apply_fn(p, xs, ts, ys) - tgts) ** 2)
    ))(pr)
    g_ref = jax.grad(
        lambda p: jnp.mean(
            (model.apply({"params": p}, x, t, y, train=False) - tgt) ** 2
        )
    )(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        ),
        g_sp, g_ref,
    )


def test_dim_sp_unconditional_matches_unsharded():
    model, params, x, t, _ = _setup()
    ref = model.apply({"params": params}, x, t, None, train=False)
    mesh = data_seq_mesh(2, 4)
    apply_fn = make_dim_sequence_parallel_apply(model, mesh)
    pr, xs, ts = _place(mesh, params, x, t)
    out = apply_fn(pr, xs, ts, None, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # differs from a REAL class (y=0 is the null row, masked to zero)
    y1 = jnp.ones((8,), jnp.int32)
    labeled = apply_fn(pr, xs, ts, jax.device_put(
        y1, NamedSharding(mesh, P("data"))), train=False)
    assert not np.allclose(np.asarray(out), np.asarray(labeled))


def test_dim_sp_dropout_decorrelated_across_data_shards():
    model, params, x, t, y = _setup(dropout=0.3)
    x = jnp.concatenate([x[:4], x[:4]])
    t = jnp.concatenate([t[:4], t[:4]])
    y = jnp.concatenate([y[:4], y[:4]])
    mesh = data_seq_mesh(2, 4)
    apply_fn = make_dim_sequence_parallel_apply(model, mesh)
    pr, xs, ts, ys = _place(mesh, params, x, t, y)
    out = np.asarray(apply_fn(pr, xs, ts, ys,
                              dropout_rng=jax.random.PRNGKey(7), train=True))
    assert not np.allclose(out[:4], out[4:])
    assert np.all(np.isfinite(out))


def test_dim_sp_remat_matches():
    model, params, x, t, y = _setup(remat=True)
    ref = model.apply({"params": params}, x, t, y, train=False)
    mesh = data_seq_mesh(2, 4)
    apply_fn = make_dim_sequence_parallel_apply(model, mesh)
    pr, xs, ts, ys = _place(mesh, params, x, t, y)
    out = apply_fn(pr, xs, ts, ys, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    g = jax.jit(jax.grad(
        lambda p: jnp.mean(apply_fn(p, xs, ts, ys) ** 2)
    ))(pr)
    assert all(
        bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g)
    )


def test_dim_sp_rejects_attention_fallback():
    model = DiM(img_size=(8, 8), patch_size=2, in_channels=3, hidden_size=32,
                depth=1, num_classes=10, use_attention_fallback=True)
    with pytest.raises(AssertionError, match="attention"):
        make_dim_sequence_parallel_apply(model, data_seq_mesh(1, 2))


def test_dim_sp_rejects_indivisible_tokens():
    model = DiM(img_size=(6, 6), patch_size=2, in_channels=3, hidden_size=32,
                depth=1, num_classes=10)  # 9 tokens
    with pytest.raises(AssertionError, match="not divisible"):
        make_dim_sequence_parallel_apply(model, data_seq_mesh(1, 2))


def test_dim_sp_rejects_shards_smaller_than_conv_halo():
    """16 tokens over 8 shards = 2 local tokens < the 3-token causal-conv
    halo (the exchange reads the immediate left neighbor only)."""
    model = DiM(img_size=(8, 8), patch_size=2, in_channels=3, hidden_size=32,
                depth=1, num_classes=10)
    with pytest.raises(AssertionError, match="halo"):
        make_dim_sequence_parallel_apply(model, data_seq_mesh(1, 8))


def test_scan_with_state_grads_match_autodiff_reference():
    """selective_scan_with_state's analytic adjoint (generalized with
    h_in input and h_out cotangent) == autodiff of an inline reference —
    covers every cotangent incl. dh_in and the g_hout -> reverse-
    recurrence initialization."""
    from diffusion_models_collection_tpu.ops.selective_scan import (
        _affine_combine,
        selective_scan_with_state,
    )

    rng = np.random.default_rng(3)
    batch, L, d_inner, n = 2, 6, 3, 2
    x = jnp.asarray(rng.standard_normal((batch, L, d_inner)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.01, 0.2, (batch, L, d_inner)), jnp.float32)
    A = -jnp.asarray(rng.uniform(0.5, 2.0, (d_inner, n)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((batch, L, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((batch, L, n)), jnp.float32)
    h_in = jnp.asarray(rng.standard_normal((batch, d_inner, n)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((batch, d_inner, n)), jnp.float32)

    def ref(x, dt, A, B, C, h_in):
        dA = jnp.exp(dt[..., None] * A[None, None])
        dBx = dt[..., None] * B[:, :, None, :] * x[..., None]
        a_cum, h_free = jax.lax.associative_scan(
            _affine_combine, (dA, dBx), axis=1)
        h = h_free + a_cum * h_in[:, None]
        return jnp.einsum("bldn,bln->bld", h, C), h[:, -1]

    def loss(f):
        def inner(*args):
            y, h_out = f(*args)
            # exercise BOTH cotangents: y and the final state
            return jnp.sum(y ** 2) + jnp.sum(h_out * w)
        return inner

    args = (x, dt, A, B, C, h_in)
    y_ours, h_ours = selective_scan_with_state(*args)
    y_ref, h_ref = ref(*args)
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(h_ours), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-6)

    g_ours = jax.grad(loss(selective_scan_with_state),
                      argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss(ref), argnums=tuple(range(6)))(*args)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)


def test_scan_with_state_chunked_path_matches():
    """Force the chunked forward (tiny budget via long L) against the
    unchunked formula."""
    from diffusion_models_collection_tpu.ops.selective_scan import (
        _scan_state_impl,
        selective_scan_with_state,
    )

    rng = np.random.default_rng(4)
    batch, L, d_inner, n = 1, 32, 4, 2
    x = jnp.asarray(rng.standard_normal((batch, L, d_inner)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.01, 0.2, (batch, L, d_inner)), jnp.float32)
    A = -jnp.asarray(rng.uniform(0.5, 2.0, (d_inner, n)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((batch, L, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((batch, L, n)), jnp.float32)
    h_in = jnp.asarray(rng.standard_normal((batch, d_inner, n)), jnp.float32)

    y_ref, h_ref = selective_scan_with_state(x, dt, A, B, C, h_in)
    import importlib

    # the package exports a `selective_scan` FUNCTION that shadows the
    # module attribute — fetch the module itself
    ss = importlib.import_module(
        "diffusion_models_collection_tpu.ops.selective_scan")
    orig = ss._auto_chunk
    ss._auto_chunk = lambda *a, **k: 8  # force 4 chunks
    try:
        y_c, h_c = _scan_state_impl(x, dt, A, B, C, h_in)
    finally:
        ss._auto_chunk = orig
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(h_c), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-6)


def test_scan_with_state_multichunk_backward_matches():
    """Force MULTIPLE backward chunks with nonzero h_in and a live h_out
    cotangent — the chunk-boundary carry threading (h_starts init +
    reverse-scan phi across boundaries) that production shard sizes hit
    but small unit shapes never would (review: round-2 pass 5)."""
    import importlib

    from diffusion_models_collection_tpu.ops.selective_scan import (
        _affine_combine,
        selective_scan_with_state,
    )

    ss = importlib.import_module(
        "diffusion_models_collection_tpu.ops.selective_scan")

    rng = np.random.default_rng(5)
    batch, L, d_inner, n = 2, 12, 3, 2
    x = jnp.asarray(rng.standard_normal((batch, L, d_inner)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.01, 0.2, (batch, L, d_inner)), jnp.float32)
    A = -jnp.asarray(rng.uniform(0.5, 2.0, (d_inner, n)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((batch, L, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((batch, L, n)), jnp.float32)
    h_in = jnp.asarray(rng.standard_normal((batch, d_inner, n)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((batch, d_inner, n)), jnp.float32)

    def ref(x, dt, A, B, C, h_in):
        dA = jnp.exp(dt[..., None] * A[None, None])
        dBx = dt[..., None] * B[:, :, None, :] * x[..., None]
        a_cum, h_free = jax.lax.associative_scan(
            _affine_combine, (dA, dBx), axis=1)
        h = h_free + a_cum * h_in[:, None]
        return jnp.einsum("bldn,bln->bld", h, C), h[:, -1]

    def loss(f):
        def inner(*args):
            y, h_out = f(*args)
            return jnp.sum(y ** 2) + jnp.sum(h_out * w)
        return inner

    args = (x, dt, A, B, C, h_in)
    orig = ss._bwd_chunk_size
    ss._bwd_chunk_size = lambda *a, **k: 4  # L=12 -> 3 backward chunks
    try:
        g_ours = jax.grad(loss(selective_scan_with_state),
                          argnums=tuple(range(6)))(*args)
    finally:
        ss._bwd_chunk_size = orig
    g_ref = jax.grad(loss(ref), argnums=tuple(range(6)))(*args)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)


def test_dim_sp_tp_forward_and_grads_match_unsharded():
    """DP x SP x TP for DiM: the distributed selective scan (seq-sharded
    recurrence) composes with Megatron channel sharding — d_inner rides
    the GSPMD auto 'model' axis through the halo'd conv, the scan
    discretization, and the in/out projections, while the scan's state
    summaries all_gather over the manual 'seq' axis. Forward AND param
    grads == the plain unsharded model."""
    from diffusion_models_collection_tpu.parallel import (
        make_dim_sequence_parallel_apply,
    )
    from diffusion_models_collection_tpu.parallel.sequence_parallel import (
        data_seq_model_mesh,
    )
    from diffusion_models_collection_tpu.parallel.tensor_parallel import (
        shard_model_params,
    )

    model, params, x, t, y = _setup()
    ref = model.apply({"params": params}, x, t, y, train=False)
    mesh = data_seq_model_mesh(2, 2, 2)
    sharded = shard_model_params(mesh, params)
    in_proj = sharded["DiMBlock_0"]["MambaBlock_0"]["Mamba_0"][
        "in_proj_x"]["kernel"]
    assert "model" in str(in_proj.sharding.spec), in_proj.sharding.spec
    apply_fn = make_dim_sequence_parallel_apply(model, mesh)
    out = apply_fn(sharded, x, t, y, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    tgt = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    g_sp = jax.grad(
        lambda p: jnp.mean((apply_fn(p, x, t, y) - tgt) ** 2)
    )(sharded)
    g_ref = jax.grad(
        lambda p: jnp.mean(
            (model.apply({"params": p}, x, t, y, train=False) - tgt) ** 2
        )
    )(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-4
        ),
        g_sp, g_ref,
    )

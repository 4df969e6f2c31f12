"""Token Merging (ToMe, Bolya et al. 2023 / ToMeSD) — extension beyond
the reference: training-free DiT inference acceleration (ops/tome.py,
models/dit.py tome_ratio)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_models_collection_tpu.models import DiT
from diffusion_models_collection_tpu.models.dit import DiTBlock
from diffusion_models_collection_tpu.ops import multihead_attention
from diffusion_models_collection_tpu.ops import tome


def region_duplicated(rng, h, w, d, sx=2, sy=2, batch=2):
    """(B, h*w, d) where every token in an sy x sx region equals its
    region's (distinct random) value."""
    nh, nw = (h + sy - 1) // sy, (w + sx - 1) // sx
    vals = jax.random.normal(rng, (batch, nh, nw, d))
    rows = jnp.arange(h) // sy
    cols = jnp.arange(w) // sx
    full = vals[:, rows][:, :, cols]  # (B, h, w, d)
    return full.reshape(batch, h * w, d)


class TestSpec:
    def test_layout_counts(self):
        spec = tome.ToMeSpec(h=8, w=8, r=10, sx=2, sy=2)
        assert spec.num_dst == 16 and spec.num_src == 48
        spec3 = tome.ToMeSpec(h=7, w=5, r=0, sx=2, sy=3)
        assert spec3.num_dst == 3 * 3  # ceil(7/3) * ceil(5/2)
        assert spec3.num_src == 35 - 9

    def test_validation(self):
        with pytest.raises(ValueError, match="exceeds"):
            tome.ToMeSpec(h=4, w=4, r=13)  # only 12 src tokens
        with pytest.raises(ValueError, match="strides"):
            tome.ToMeSpec(h=4, w=4, r=1, sx=0)
        with pytest.raises(ValueError, match="tome_ratio"):
            tome.ToMeSpec.from_ratio(4, 4, 1.5)

    def test_from_ratio(self):
        spec = tome.ToMeSpec.from_ratio(8, 8, 0.5)
        assert spec.r == 32  # 50% of 64 tokens, <= 48 srcs
        # clamps to the available sources
        assert tome.ToMeSpec.from_ratio(8, 8, 0.9).r == 48
        assert tome.ToMeSpec.from_ratio(8, 8, 0.0) is None

    def test_partition_anchors(self):
        dst, src = tome._partition(tome.ToMeSpec(4, 4, 0))
        # top-left anchor of every 2x2 region on a 4x4 grid
        assert dst.tolist() == [0, 2, 8, 10]
        assert len(set(dst) | set(src)) == 16


class TestMergeMath:
    def test_duplicates_merge_to_region_mean_and_unmerge(self):
        """Region-duplicated tokens merge losslessly: every merged dst is
        its region's (identical) value and unmerge restores the input."""
        spec = tome.ToMeSpec.from_ratio(8, 8, 0.5)
        x = region_duplicated(jax.random.PRNGKey(0), 8, 8, 16)
        plan = tome.build_plan(x, spec)
        merged = tome.merge(plan, x)
        assert merged.shape == (2, 64 - 32, 16)
        np.testing.assert_allclose(
            np.asarray(tome.unmerge(plan, merged)), np.asarray(x),
            atol=1e-6,
        )
        # multiplicities: 32 merged into 16 dsts of duplicated regions —
        # sizes sum to the original token count
        s = tome.sizes(plan)
        assert s.shape == (2, 32)
        np.testing.assert_allclose(np.asarray(jnp.sum(s, axis=1)), 64.0)

    def test_merge_is_size_weighted_mean(self):
        """Hand-checkable: all sources identical to one dst value except
        content drives assignment; verify the aggregated mean."""
        spec = tome.ToMeSpec(h=2, w=2, r=2, sx=2, sy=2)
        # grid: token0 = dst, tokens 1,2,3 = src; make 1 and 2 exact
        # duplicates of dst (merge), 3 orthogonal (kept)
        v_dst = jnp.array([1.0, 0.0, 0.0, 0.0])
        v_orth = jnp.array([0.0, 1.0, 0.0, 0.0])
        x = jnp.stack([v_dst, 2 * v_dst, 3 * v_dst, v_orth])[None]
        plan = tome.build_plan(x, spec)
        merged = tome.merge(plan, x)
        # layout [kept srcs ; dsts] = [v_orth, mean(1,2,3)*v_dst]
        np.testing.assert_allclose(np.asarray(merged[0, 0]), v_orth)
        np.testing.assert_allclose(
            np.asarray(merged[0, 1]), 2.0 * v_dst, atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(tome.sizes(plan)[0]),
                                   [1.0, 3.0])
        # unmerge: merged srcs take the dst row, kept keeps its own
        out = tome.unmerge(plan, merged)
        np.testing.assert_allclose(np.asarray(out[0, 1]), 2.0 * v_dst)
        np.testing.assert_allclose(np.asarray(out[0, 2]), 2.0 * v_dst)
        np.testing.assert_allclose(np.asarray(out[0, 3]), v_orth)

    def test_sum_mode_and_bad_mode(self):
        spec = tome.ToMeSpec.from_ratio(4, 4, 0.4)
        x = region_duplicated(jax.random.PRNGKey(1), 4, 4, 8, batch=1)
        plan = tome.build_plan(x, spec)
        s = tome.merge(plan, x, mode="sum")
        m = tome.merge(plan, x, mode="mean")
        np.testing.assert_allclose(
            np.asarray(s[:, -spec.num_dst:]),
            np.asarray(m[:, -spec.num_dst:]
                       * plan["counts"][..., None]),
            rtol=1e-6,
        )
        with pytest.raises(ValueError, match="mode"):
            tome.merge(plan, x, mode="max")

    def test_metric_shape_validation(self):
        spec = tome.ToMeSpec.from_ratio(4, 4, 0.25)
        with pytest.raises(ValueError, match="metric"):
            tome.build_plan(jnp.zeros((1, 9, 4)), spec)


class TestProportionalAttentionExactness:
    def test_merged_attention_exact_for_duplicates(self):
        """The load-bearing invariant: with exactly duplicated tokens,
        merge -> proportional attention -> unmerge EQUALS full attention
        (log-size key bias restores the softmax multiplicity; duplicated
        queries receive identical rows). Wrong sizes, wrong unmerge maps
        or a missing bias all break this."""
        h = w = 8
        x = region_duplicated(jax.random.PRNGKey(2), h, w, 32, batch=2)
        full = multihead_attention(x, x, x, 4)
        spec = tome.ToMeSpec.from_ratio(h, w, 0.75)  # all 48 srcs merge
        assert spec.r == 48
        plan = tome.build_plan(x, spec)
        xm = tome.merge(plan, x)
        out = multihead_attention(xm, xm, xm, 4,
                                  key_sizes=tome.sizes(plan))
        np.testing.assert_allclose(
            np.asarray(tome.unmerge(plan, out)), np.asarray(full),
            atol=1e-5,
        )

    def test_all_ones_sizes_is_noop(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 32))
        a = multihead_attention(x, x, x, 4)
        b = multihead_attention(x, x, x, 4,
                                key_sizes=jnp.ones((2, 16)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestDiTIntegration:
    def _model(self, **kw):
        return DiT(img_size=(16, 16), patch_size=2, in_channels=3,
                   hidden_size=64, depth=2, num_heads=4, num_classes=10,
                   dropout=0.0, **kw)

    def _init(self, model):
        return model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)),
            jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
        )

    def test_param_tree_unchanged_and_ratio0_bitwise(self):
        """ToMe is parameter-free: any checkpoint samples with merging on."""
        base = self._model()
        merged = self._model(tome_ratio=0.5)
        vb = self._init(base)
        assert (
            jax.tree_util.tree_structure(vb)
            == jax.tree_util.tree_structure(self._init(merged))
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        t = jnp.asarray([5, 9]); y = jnp.asarray([1, 2])
        out0 = base.apply(vb, x, t, y)
        out0b = self._model(tome_ratio=0.0).apply(vb, x, t, y)
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(out0b))

    def test_tome_forward_runs_and_approximates(self):
        model = self._model()
        variables = self._init(model)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
        t = jnp.asarray([5, 9]); y = jnp.asarray([1, 2])
        ref = model.apply(variables, x, t, y)
        for kw in ({"tome_ratio": 0.25}, {"tome_ratio": 0.5,
                                          "tome_mlp": True}):
            out = self._model(**kw).apply(variables, x, t, y)
            assert out.shape == ref.shape
            assert bool(jnp.all(jnp.isfinite(out)))
            # approximation, not garbage: freshly-initialized DiT is an
            # identity-residual net, outputs stay in the same range
            assert float(jnp.max(jnp.abs(out - ref))) < 1.0
        # deterministic
        a = self._model(tome_ratio=0.5).apply(variables, x, t, y)
        b = self._model(tome_ratio=0.5).apply(variables, x, t, y)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_tome_rejects_sequence_parallel(self):
        block = DiTBlock(64, 4, tome=tome.ToMeSpec(4, 4, 4),
                         kv_axis="seq")
        with pytest.raises(ValueError, match="sequence parallelism"):
            block.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 64)),
                       jnp.zeros((1, 64)))

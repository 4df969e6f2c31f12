"""int8 w8a8 inference (ops/quant.py) — extension beyond the reference:
DiT block matmuls through the MXU int8 path, fp32 checkpoints unchanged."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_models_collection_tpu.models import DiT
from diffusion_models_collection_tpu.ops.quant import (
    Int8Dense,
    dense_layer,
    int8_matmul,
)


class TestInt8Matmul:
    def test_close_to_fp32(self):
        """Dynamic per-token/per-channel symmetric quantization keeps
        well-conditioned matmuls within ~1% relative error."""
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 64, 128).astype(np.float32))
        w = jnp.asarray(rng.randn(128, 256).astype(np.float32))
        exact = x @ w
        q = int8_matmul(x, w)
        rel = float(
            jnp.linalg.norm(q - exact) / jnp.linalg.norm(exact)
        )
        assert rel < 0.015, rel

    def test_exact_on_grid_values(self):
        """Inputs already on the quantization grid round-trip exactly:
        x in scale*{-127..127}, w columns in their own grids."""
        # per-output-channel scales: col absmax/127 — every entry an
        # integer multiple of its column's scale, so quantization is exact
        w = jnp.asarray([[127.0, 0.0], [0.0, -127.0],
                         [63.0, 64.0], [0.0, 0.0]]) / 127.0
        # likewise x: absmax 6 -> scale 6/127, entries = integer * scale
        s = 6.0 / 127.0
        x = jnp.asarray([[s * 10, -s * 40, s * 127, 0.0]])
        exact = x @ w
        np.testing.assert_allclose(
            np.asarray(int8_matmul(x, w)), np.asarray(exact),
            rtol=1e-6, atol=1e-6,
        )

    def test_zero_input_safe(self):
        out = int8_matmul(jnp.zeros((2, 8)), jnp.ones((8, 4)))
        np.testing.assert_array_equal(np.asarray(out), 0.0)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestInt8Dense:
    def test_param_tree_matches_nn_dense(self):
        x = jnp.ones((2, 16))
        vq = Int8Dense(32, name="Dense_0").init(jax.random.PRNGKey(0), x)
        vd = nn.Dense(32, name="Dense_0").init(jax.random.PRNGKey(0), x)
        assert (
            jax.tree_util.tree_structure(vq)
            == jax.tree_util.tree_structure(vd)
        )
        assert all(
            a.shape == b.shape
            for a, b in zip(jax.tree_util.tree_leaves(vq),
                            jax.tree_util.tree_leaves(vd))
        )

    def test_dense_layer_switch(self):
        assert isinstance(dense_layer(None, 8, name="Dense_0"), nn.Dense)
        assert isinstance(dense_layer("int8", 8, name="Dense_0"),
                          Int8Dense)
        with pytest.raises(ValueError, match="quant"):
            dense_layer("fp8", 8, name="Dense_0")

    def test_matches_dense_numerics(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
        d = nn.Dense(32, name="Dense_0")
        v = d.init(jax.random.PRNGKey(2), x)
        exact = d.apply(v, x)
        q = Int8Dense(32, name="Dense_0").apply(v, x)
        rel = float(jnp.linalg.norm(q - exact) / jnp.linalg.norm(exact))
        assert rel < 0.02, rel


class TestDiTQuant:
    def _model(self, **kw):
        return DiT(img_size=(16, 16), patch_size=2, in_channels=3,
                   hidden_size=64, depth=2, num_heads=4, num_classes=10,
                   dropout=0.0, **kw)

    def test_checkpoint_compatible_and_close(self):
        """quant='int8' applies any fp32 checkpoint unchanged and stays
        a close approximation of the fp32 forward."""
        base = self._model()
        v = base.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)),
            jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
        )
        qmodel = self._model(quant="int8")
        assert (
            jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(qmodel.init(
                jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)),
                jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
            ))
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        t = jnp.asarray([5, 9]); y = jnp.asarray([1, 2])
        ref = base.apply(v, x, t, y)
        q = qmodel.apply(v, x, t, y)
        assert q.shape == ref.shape
        assert bool(jnp.all(jnp.isfinite(q)))
        # residual-stream quantization error stays small (random-init
        # DiT outputs are O(x) through the identity residual)
        assert float(jnp.max(jnp.abs(q - ref))) < 0.15
        # composes with token merging
        qt = self._model(quant="int8", tome_ratio=0.5).apply(v, x, t, y)
        assert bool(jnp.all(jnp.isfinite(qt)))

    def test_quant_train_rejected(self):
        model = self._model(quant="int8")
        with pytest.raises(ValueError, match="inference-only"):
            model.init(
                jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)),
                jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
                train=True,
            )

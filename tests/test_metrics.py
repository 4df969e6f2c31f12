"""Metric correctness: Fréchet closed form, IS on synthetic logits, LPIPS
properties, InceptionV3 port shape contract (SURVEY.md §4 golden plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.metrics import (
    FIDScore,
    InceptionScore,
    LPIPSScore,
)


def test_frechet_distance_identical_is_zero():
    mu = np.zeros(4)
    sigma = np.eye(4)
    d = FIDScore.calculate_frechet_distance(mu, sigma, mu, sigma)
    assert abs(d) < 1e-8


def test_frechet_distance_mean_shift_closed_form():
    """For equal covariances, FID = ||mu1 - mu2||^2."""
    mu1 = np.zeros(8)
    mu2 = np.full(8, 0.5)
    sigma = np.eye(8) * 2.0
    d = FIDScore.calculate_frechet_distance(mu1, sigma, mu2, sigma)
    assert d == pytest.approx(np.sum((mu1 - mu2) ** 2), rel=1e-6)


def test_frechet_distance_diagonal_closed_form():
    """Diagonal Gaussians: sum over dims of (s1 + s2 - 2*sqrt(s1*s2))."""
    rng = np.random.default_rng(0)
    s1 = np.abs(rng.random(6)) + 0.1
    s2 = np.abs(rng.random(6)) + 0.1
    d = FIDScore.calculate_frechet_distance(
        np.zeros(6), np.diag(s1), np.zeros(6), np.diag(s2)
    )
    expected = np.sum(s1 + s2 - 2 * np.sqrt(s1 * s2))
    assert d == pytest.approx(expected, rel=1e-5)


def test_fid_on_synthetic_gaussian_features():
    """End-to-end statistics path with an identity feature_fn: empirical FID
    of two Gaussian clouds approaches the closed-form distance."""
    rng = np.random.default_rng(1)
    dim = 4
    n = 4000
    real = rng.normal(0.0, 1.0, size=(n, 1, 1, dim)).astype(np.float32)
    fake = rng.normal(1.0, 1.0, size=(n, 1, 1, dim)).astype(np.float32)
    fid = FIDScore(feature_fn=lambda x: jnp.reshape(x, (x.shape[0], dim)))
    d = fid.compute_fid(real, fake, batch_size=1000)
    assert d == pytest.approx(dim * 1.0, rel=0.15)  # ||mu diff||^2 = 4


def test_inception_score_extremes():
    """Perfectly confident + uniform class usage -> IS = num_classes;
    uniform predictions -> IS = 1."""
    n, k = 100, 10
    labels = np.arange(n) % k
    confident = np.full((n, k), -1e9, dtype=np.float32)
    confident[np.arange(n), labels] = 1e9

    isc = InceptionScore(logits_fn=lambda b: jnp.asarray(
        confident[: b.shape[0]]
    ))
    # feed images in chunks matching logits slices: use one batch
    mean, std = isc.compute_inception_score(
        np.zeros((n, 2, 2, 3), np.float32), batch_size=n, splits=10
    )
    assert mean == pytest.approx(k, rel=1e-3)

    uniform = np.zeros((n, k), dtype=np.float32)
    isc2 = InceptionScore(logits_fn=lambda b: jnp.asarray(uniform[: b.shape[0]]))
    mean2, _ = isc2.compute_inception_score(
        np.zeros((n, 2, 2, 3), np.float32), batch_size=n, splits=10
    )
    assert mean2 == pytest.approx(1.0, rel=1e-4)


def test_lpips_identical_images_zero():
    lp = LPIPSScore()
    imgs = np.random.default_rng(0).random((4, 32, 32, 3)).astype(np.float32)
    d = lp.compute_lpips(imgs, imgs)
    assert d == pytest.approx(0.0, abs=1e-6)


def test_lpips_differs_for_different_images():
    lp = LPIPSScore()
    rng = np.random.default_rng(0)
    a = rng.random((4, 32, 32, 3)).astype(np.float32)
    b = rng.random((4, 32, 32, 3)).astype(np.float32)
    assert lp.compute_lpips(a, b) > 0


def test_lpips_diversity_distinct_pairs():
    lp = LPIPSScore()
    rng = np.random.default_rng(0)
    imgs = rng.random((8, 32, 32, 3)).astype(np.float32)
    d = lp.compute_lpips_diversity(imgs, num_pairs=20)
    assert np.isfinite(d) and d > 0


@pytest.mark.slow
def test_inception_v3_shapes():
    """The Flax InceptionV3 port produces (2048,) pool features and
    (1000,) logits from a 299x299 input."""
    from diffusion_models_collection_tpu.metrics.inception import InceptionV3

    model = InceptionV3()
    x = jnp.zeros((1, 299, 299, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    feats, logits = model.apply({"params": params}, x)
    assert feats.shape == (1, 2048)
    assert logits.shape == (1, 1000)


def test_newton_schulz_trace_sqrtm_matches_scipy():
    """On-device trace(sqrtm) vs scipy for an SPD product matrix."""
    from scipy import linalg

    rng = np.random.default_rng(0)
    a = rng.normal(size=(16, 16))
    s1 = a @ a.T + 0.5 * np.eye(16)
    b = rng.normal(size=(16, 16))
    s2 = b @ b.T + 0.5 * np.eye(16)
    prod = s1 @ s2
    ref = np.trace(linalg.sqrtm(prod).real)
    got = FIDScore.trace_sqrtm_newton_schulz(prod, iters=50)
    assert got == pytest.approx(ref, rel=1e-3)


def test_torchvision_weight_converter_roundtrip(tmp_path):
    """load_torchvision_weights: build a torch-layout state dict from our
    flax tree's inverse mapping, convert, and require an identical tree —
    validates the key mapping and the OIHW->HWIO / transpose handling."""
    import torch

    from diffusion_models_collection_tpu.metrics.inception import (
        InceptionV3,
        load_torchvision_weights,
    )

    model = InceptionV3()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))[
        "params"
    ]

    state = {}

    def walk(tree, path):
        for key, val in tree.items():
            p = path + [key]
            if isinstance(val, dict):
                walk(val, p)
                continue
            arr = np.asarray(val)
            if key == "kernel" and p[-2] == "conv":
                state[".".join(p[:-1]) + ".weight"] = torch.tensor(
                    arr.transpose(3, 2, 0, 1)
                )
            elif p[-2] == "fc":
                name = {"kernel": "weight", "bias": "bias"}[key]
                state[f"fc.{name}"] = torch.tensor(
                    arr.T if key == "kernel" else arr
                )
            elif key.startswith("bn_"):
                name = {
                    "bn_scale": "weight",
                    "bn_bias": "bias",
                    "bn_mean": "running_mean",
                    "bn_var": "running_var",
                }[key]
                state[".".join(p[:-1]) + f".bn.{name}"] = torch.tensor(arr)

    walk(params, [])
    path = tmp_path / "inception.pth"
    torch.save(state, path)

    converted = load_torchvision_weights(path)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(converted))
    assert len(flat_a) == len(flat_b)
    for key_path, leaf in flat_a:
        np.testing.assert_allclose(flat_b[key_path], leaf, rtol=1e-6)

"""Test configuration: run everything on a fake 8-device CPU mesh.

This is the TPU-native answer to "test distributed code without a cluster"
(SURVEY.md §4): XLA's host platform is forced to expose 8 virtual devices so
sharding/collective paths compile and execute in CI, while numerics tests
run on the same backend deterministically.

Must set env vars before jax initializes its backends, hence module scope.
"""

import os
import sys
from pathlib import Path

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU: the ambient sitecustomize registers the TPU plugin and sets
# jax_platforms programmatically, so the env var alone is not enough — the
# config must be overridden after import, before backends initialize.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: identical train-step/sampler HLO across
# tests (and across runs) compiles once. The dir is fingerprinted by the
# host CPU's feature set (see tests/cache_dir.py): XLA:CPU AOT
# executables are microarchitecture-specific, and loading entries
# written by a DIFFERENT host (possible when /tmp outlives a machine
# swap) warns "could lead to execution errors such as SIGILL" and was
# observed to SIGSEGV/SIGABRT mid-suite.
sys.path.insert(0, str(Path(__file__).resolve().parent))
from cache_dir import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# ---------------------------------------------------------------- markers
# Two-tier suite (round-2 VERDICT weak 2: the full suite crossed 58 min
# on a 1-core host with no fast lane). `pytest -m "not slow"` is the
# <10-min gate; the full suite runs nightly/per-round. Assignment is by
# module, from measured per-file durations on the 1-core reference host
# (see docs/status.md "test suite tiers").
import pytest  # noqa: E402

# spawn CLI subprocesses / HTTP servers / jax.distributed clusters
E2E_MODULES = {
    "test_cli",
    "test_multihost",
    "test_serve",
    "test_serving",
    "test_native",  # builds/loads the C++ extension, spawns decode pools
}

# heavy-compile legs (many distinct jitted programs) — measured >60 s/file
SLOW_MODULES = {
    "test_parallel",
    "test_fsdp",
    "test_pipeline_parallel",
    "test_sequence_parallel",
    "test_tensor_parallel",
    "test_dim_sequence_parallel",
    "test_moe",
    "test_trainer",
    "test_trainer_backbones",
    "test_consistency_training",
    "test_distillation",
    "test_golden",
    "test_torch_import",
    "test_torch_export",
    "test_latent_diffusion",
    "test_super_resolution",
    "test_classifier_guidance",
    "test_deepcache",
    "test_metrics",
    "test_samplers",
    "test_restart_sampling",
    "test_img2img",
    "test_pallas_kernels",
    "test_vae",
    "test_reflow",
}


# Individually-demoted heavy tests inside otherwise-fast modules
# (round-4: the module-level split left the fast lane at 16 min measured;
# these singles — per `pytest -m "not slow" --durations`, 1-core host —
# account for ~10 of those minutes). A bare name demotes every
# parametrization of EXACTLY that test (suffix match on the nodeid with
# "[param]" stripped — a bare entry must not also demote a future test
# whose name merely extends it, ADVICE r4); a "[param]" entry demotes
# just that parametrization (substring match).
SLOW_TESTS = {
    "test_consistency.py::test_consistency_distillation_end_to_end",  # 100s
    "test_serving_engine.py::test_service_continuous_mode",           # 66s
    "test_serving_engine.py::test_service_rejects_continuous_non_ddim",
    "test_models.py::test_remat_identical_params_and_grads",          # 98s
    "test_models.py::test_conditional_null_label_differs[unet]",      # 26s
    "test_models.py::test_forward_shape_unconditional[unet]",         # 25s
    "test_models.py::test_non_square_image",                          # 21s
    "test_models.py::test_unet_attention_resolution_quirk",           # 16s
    "test_models.py::test_bf16_compute_dtype_matches_fp32[unet]",     # 16s
    "test_edm.py::test_trainer_edm_end_to_end",                       # 37s
    "test_dp_sampling.py::test_dp_sampling_matches_single_device[ddpm]",
    "test_flow_matching.py::test_trainer_flow_matching_end_to_end",   # 29s
    "test_kid.py::test_inception_feature_path_smoke",                 # 22s
    "test_pag.py::test_pag_sampling_under_jit",                       # 18s
    "test_pag.py::test_perturbed_model_shares_param_tree[unet]",      # 14s
    "test_quant.py::TestDiTQuant::test_checkpoint_compatible_and_close",
    "test_freeu.py::test_unit_factors_are_bitwise_parity",            # 16s
    "test_bench_legs.py::test_train_step_leg_runs_tiny",              # 41s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in E2E_MODULES:
            item.add_marker(pytest.mark.e2e)
            item.add_marker(pytest.mark.slow)
        elif mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        elif any(
            (s in item.nodeid) if "[" in s
            else item.nodeid.split("[")[0].endswith(s)
            for s in SLOW_TESTS
        ):
            item.add_marker(pytest.mark.slow)

"""Reflow (rectified-flow straightening, Liu et al. 2023) — extension."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

T = 20


def _flow_teacher_checkpoint(tmp_path, conditional=True):
    from diffusion_models_collection_tpu.factory import (
        get_model, init_model_params,
    )
    from diffusion_models_collection_tpu.utils import checkpoint as ckpt_lib

    cfg = {
        "model_type": "unet",
        "model_params": {
            "in_channels": 3, "model_channels": 16, "out_channels": 3,
            "num_res_blocks": 1, "attention_resolutions": (4,),
            "channel_mult": (1, 2), "dropout": 0.0,
        },
        "image_size": (8, 8), "conditional": conditional,
        "num_classes": 10 if conditional else None,
        "diffusion_type": "flow_matching",
        "num_timesteps": T, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear", "loss_type": "l2",
        "num_inference_steps": 4, "cfg_scale": 1.5,
        "dataset": "synthetic", "data_root": "./data",
    }
    model = get_model(cfg)
    params = init_model_params(
        model, jax.random.PRNGKey(0), (8, 8), 3, conditional
    )
    path = tmp_path / "flow_teacher.ckpt"
    ckpt_lib.save_checkpoint(
        path, epoch=1, params=params, opt_state=None, best_loss=1.0,
        config=cfg,
    )
    return path, cfg


def test_reflow_end_to_end(tmp_path):
    """Two rectification rounds on a tiny flow teacher; the outputs
    sample through the ordinary factory stack at 1 step."""
    from diffusion_models_collection_tpu.diffusion import FlowMatching
    from diffusion_models_collection_tpu.factory import (
        eval_model_fn, get_diffusion, get_model,
    )
    from diffusion_models_collection_tpu.utils import checkpoint as ckpt_lib
    from diffusion_models_collection_tpu.utils.reflow_trainer import (
        ReflowTrainer,
    )
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    teacher_path, _ = _flow_teacher_checkpoint(tmp_path)
    cfg = {
        "teacher_checkpoint": str(teacher_path),
        "reflow_pairs": 16, "reflow_rounds": 2, "pair_batch_size": 8,
        "teacher_sample_steps": 4, "reflow_cfg_scale": 1.5,
        "epochs": 2,
        "optimizer": "adamw", "learning_rate": 1e-3, "weight_decay": 0.0,
        "gradient_accumulation_steps": 1, "use_scheduler": False,
        "use_ema": True, "ema_decay": 0.9,
        "save_dir": str(tmp_path / "reflow"), "seed": 0,
        "use_swanlab": False,
    }
    trainer = ReflowTrainer(cfg, rng=jax.random.PRNGKey(0),
                            tracker=NullTracker())
    trainer.reflow()

    for rnd in (1, 2):
        path = tmp_path / "reflow" / f"reflow_round{rnd}.ckpt"
        assert path.exists()
        payload = ckpt_lib.load_checkpoint(path)
        out_cfg = payload["config"]
        assert out_cfg["diffusion_type"] == "flow_matching"
        assert out_cfg["reflow_rounds_done"] == rnd
        model = get_model(out_cfg)
        fn = eval_model_fn(model, payload["ema_model_state_dict"])
        d = get_diffusion(out_cfg)
        assert isinstance(d, FlowMatching)
        d.set_inference_steps(1)  # the reflow goal: 1-step sampling
        out = d.sample_with_cfg(
            fn, (2, 8, 8, 3), jnp.array([1, 2], jnp.int32),
            jax.random.PRNGKey(0), cfg_scale=1.5,
        )
        assert out.shape == (2, 8, 8, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_reflow_synthesized_pairs_are_teacher_couplings(tmp_path):
    """The pair set must satisfy x_hat == teacher ODE solution from z
    (the whole point: the student learns the teacher's own coupling)."""
    from diffusion_models_collection_tpu.factory import (
        eval_model_fn, get_diffusion, get_model,
    )
    from diffusion_models_collection_tpu.utils import checkpoint as ckpt_lib
    from diffusion_models_collection_tpu.utils.reflow_trainer import (
        ReflowTrainer,
    )
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    teacher_path, t_cfg = _flow_teacher_checkpoint(tmp_path,
                                                   conditional=False)
    cfg = {
        "teacher_checkpoint": str(teacher_path),
        "reflow_pairs": 8, "pair_batch_size": 8,
        "teacher_sample_steps": 4, "epochs": 1,
        "optimizer": "adamw", "learning_rate": 1e-3,
        "save_dir": str(tmp_path / "reflow"), "seed": 0,
        "use_swanlab": False,
    }
    trainer = ReflowTrainer(cfg, rng=jax.random.PRNGKey(5),
                            tracker=NullTracker())
    x_hat, z, _ = trainer._synthesize_pairs(
        trainer.teacher_params, jax.random.PRNGKey(7)
    )
    assert x_hat.shape == z.shape == (8, 8, 8, 3)
    # re-integrate the teacher ODE from the stored z: must reproduce x_hat
    payload = ckpt_lib.load_checkpoint(teacher_path)
    model = get_model(t_cfg)
    fn = eval_model_fn(model, payload["model_state_dict"])
    d = get_diffusion(t_cfg)
    ref = d.sample(fn, z.shape, jax.random.PRNGKey(0),
                   init_noise=jnp.asarray(z))
    np.testing.assert_allclose(x_hat, np.asarray(ref), atol=1e-5)
    # couplings are nontrivial (z itself is not the output)
    assert float(np.max(np.abs(x_hat - z))) > 1e-3


def test_reflow_validation(tmp_path):
    from diffusion_models_collection_tpu.utils import checkpoint as ckpt_lib
    from diffusion_models_collection_tpu.utils.reflow_trainer import (
        ReflowTrainer,
    )

    # VP (DDPM) teachers are rejected — reflow is a flow-family tool
    from diffusion_models_collection_tpu.factory import (
        get_model, init_model_params,
    )

    vp_cfg = {
        "model_type": "unet",
        "model_params": {
            "in_channels": 3, "model_channels": 8, "out_channels": 3,
            "num_res_blocks": 1, "attention_resolutions": (4,),
            "channel_mult": (1, 2), "dropout": 0.0,
        },
        "image_size": (8, 8), "conditional": False,
        "num_timesteps": T, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear", "num_inference_steps": 4,
    }
    model = get_model(vp_cfg)
    params = init_model_params(model, jax.random.PRNGKey(0), (8, 8), 3,
                               False)
    vp_path = tmp_path / "vp.ckpt"
    ckpt_lib.save_checkpoint(vp_path, epoch=1, params=params,
                             opt_state=None, best_loss=1.0, config=vp_cfg)
    base_cfg = {"optimizer": "adamw", "learning_rate": 1e-3,
                "use_swanlab": False, "save_dir": str(tmp_path / "o")}
    with pytest.raises(ValueError, match="FLOW"):
        ReflowTrainer({**base_cfg, "teacher_checkpoint": str(vp_path)})

    flow_path, _ = _flow_teacher_checkpoint(tmp_path, conditional=False)
    with pytest.raises(ValueError, match="conditional"):
        ReflowTrainer({**base_cfg, "teacher_checkpoint": str(flow_path),
                       "reflow_cfg_scale": 2.0})
    with pytest.raises(ValueError, match="pair_batch_size"):
        ReflowTrainer({**base_cfg, "teacher_checkpoint": str(flow_path),
                       "reflow_pairs": 4, "pair_batch_size": 8})
    # rounds 0 would be a silent no-op that still prints success
    with pytest.raises(ValueError, match="reflow_rounds"):
        ReflowTrainer({**base_cfg, "teacher_checkpoint": str(flow_path),
                       "reflow_rounds": 0})
    # pair counts round UP to a synthesis-batch multiple: nothing
    # synthesized is discarded and every epoch consumes every pair
    tr = ReflowTrainer({**base_cfg, "teacher_checkpoint": str(flow_path),
                        "reflow_pairs": 10, "pair_batch_size": 8})
    assert tr.n_pairs == 16

"""CIFAR-10 DiT-MoE training config (extension — the reference has no MoE;
same schema as configs/cifar10_dit.py with the routed-expert keys added).

Each DiT block's MLP becomes a bank of `num_experts` expert MLPs behind a
top-k router (models/moe.py). Per-token FLOPs stay at ~top_k/num_experts
of the equivalent dense width while parameter count scales with
num_experts — the standard sparse-capacity trade. `expert_parallel: E`
shards the stacked expert weights over an 'expert' mesh axis
(parallel/expert_parallel.py); leave it at 1 for a single chip.
"""

config = {
    'project_name': 'diffusion-models',
    'experiment_name': 'cifar10-dit-moe-ddpm',

    'model_type': 'dit',
    'model_params': {
        'img_size': (32, 32),
        'patch_size': 2,
        'in_channels': 3,
        'hidden_size': 384,
        'depth': 12,
        'num_heads': 6,
        'mlp_ratio': 4.0,
        'dropout': 0.1,
        # --- MoE extension ---
        'num_experts': 8,
        'moe_top_k': 2,
        'moe_capacity_factor': 1.25,
    },

    # Load-balance aux loss weight (Switch Transformer default).
    'moe_aux_weight': 0.01,
    # Shard the expert bank over this many devices (must divide
    # num_experts and the device count); 1 = no expert parallelism.
    'expert_parallel': 1,

    'dataset': 'cifar10',
    'data_root': './data',
    'image_size': (32, 32),
    'conditional': True,
    'num_classes': 10,
    'use_subdirs': False,
    'label_file': None,

    'num_timesteps': 1000,
    'beta_start': 0.0001,
    'beta_end': 0.02,
    'beta_schedule': 'linear',
    'loss_type': 'l2',
    'mixed_precision': 'none',
    'remat': False,
    'cfg_scale': 1.8,

    'num_inference_steps': 50,
    'ddim_eta': 0.0,

    'epochs': 2000,
    'batch_size': 128,
    'num_workers': 4,
    'optimizer': 'adamw',
    'learning_rate': 2e-4,
    'weight_decay': 1e-4,
    'gradient_accumulation_steps': 1,
    'use_ema': True,
    'ema_decay': 0.9999,
    'cfg_dropout_prob': 0.2,

    'use_scheduler': True,
    'scheduler_type': 'warmup_cosine',
    'warmup_epochs': 20,
    'warmup_start_factor': 0.01,

    'save_dir': './checkpoints/cifar10_dit_moe',
    'save_interval': 50,
    'resume_path': None,

    'sample_dir': './generated_images/cifar10_dit_moe',
    'sample_interval': 50,
    'sample_start_epoch': 200,
    'num_samples': 16,

    'use_swanlab': False,
    'gpu_ids': [0],
    'port': '12355',
    'seed': 42,
}

"""CIFAR-10 DiT training config (reference configs/cifar10_dit.py schema,
pointed at real CIFAR-10; class-conditional with CFG)."""

config = {
    'project_name': 'diffusion-models',
    'experiment_name': 'cifar10-dit-ddpm',

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
    },

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
    # 'bf16' = bfloat16 compute with fp32 master weights (+25-35%
    # train throughput on TPU); 'none' = full fp32 (reference parity)
    'mixed_precision': 'none',
    # True = per-block gradient checkpointing (less activation memory,
    # ~1/3 more backward FLOPs) — for bigger batches / deeper models
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

    'save_dir': './checkpoints/cifar10_dit',
    'save_interval': 50,
    'resume_path': None,

    'sample_dir': './generated_images/cifar10_dit',
    'sample_interval': 50,
    'sample_start_epoch': 200,
    'num_samples': 16,

    'use_swanlab': False,
    'gpu_ids': [0],
    'port': '12355',
    'seed': 42,
}

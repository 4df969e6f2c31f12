"""CIFAR-10 UNet training config.

Same schema as reference configs/cifar10_unet.py, pointed at the actual
CIFAR-10 dataset (the reference ships with a private custom-folder path).
TPU keys: `gpu_ids`/`port` are accepted for parity but unused — device
selection belongs to the JAX runtime / mesh.
"""

config = {
    # Project
    'project_name': 'diffusion-models',
    'experiment_name': 'cifar10-unet-ddpm',

    # Model
    'model_type': 'unet',
    'model_params': {
        'image_size': (32, 32),
        'in_channels': 3,
        'model_channels': 128,
        'out_channels': 3,
        'num_res_blocks': 2,
        'attention_resolutions': (16, 8),
        'dropout': 0.1,
        'channel_mult': (1, 2, 2, 2),
        'use_attention': True,
    },

    # Dataset
    'dataset': 'cifar10',
    'data_root': './data',
    'image_size': (32, 32),
    'conditional': True,
    'num_classes': 10,
    'use_subdirs': False,
    'label_file': None,

    # Diffusion (training always uses DDPM; sampling method is a CLI flag)
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
    'cfg_scale': 1.4,

    # For DDIM sampling
    'num_inference_steps': 50,
    'ddim_eta': 0.0,

    # Training
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

    # Learning rate schedule
    'use_scheduler': True,
    'scheduler_type': 'warmup_cosine',
    'warmup_epochs': 20,
    'warmup_start_factor': 0.01,

    # Checkpointing
    'save_dir': './checkpoints/cifar10_unet',
    'save_interval': 50,
    'resume_path': None,

    # Sampling
    'sample_dir': './generated_images/cifar10_unet',
    'sample_interval': 50,
    'sample_start_epoch': 200,
    'num_samples': 16,

    # Monitoring
    'use_swanlab': False,

    # Device settings (parity keys; unused on TPU)
    'gpu_ids': [0],
    'port': '12355',

    # Random seed
    'seed': 42,
}

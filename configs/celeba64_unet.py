"""CelebA 64x64 UNet data-parallel training config (BASELINE.json config
#5). Unconditional (CelebA has no class labels)."""

config = {
    'project_name': 'diffusion-models',
    'experiment_name': 'celeba64-unet-ddpm',

    'model_type': 'unet',
    'model_params': {
        'image_size': (64, 64),
        'in_channels': 3,
        'model_channels': 128,
        'out_channels': 3,
        'num_res_blocks': 2,
        'attention_resolutions': (16, 8),
        'dropout': 0.1,
        'channel_mult': (1, 2, 2, 4),
        'use_attention': True,
    },

    'dataset': 'celeba',
    'data_root': './data',
    'image_size': (64, 64),
    'conditional': False,
    'num_classes': 0,
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
    'cfg_scale': 0.0,

    'num_inference_steps': 50,
    'ddim_eta': 0.0,

    'epochs': 500,
    'batch_size': 256,  # global batch across the data-parallel mesh
    'num_workers': 8,        # JPEG-decode threads (lazy datasets)
    # one-time parallel decode of all 200k JPEGs to a ~2.3 GB uint8 cache;
    # every epoch after that runs the fused native batch-assembly path
    'cache_decoded': True,
    # decode 218x178 JPEGs at 1/2 DCT scale (libjpeg scaled IDCT) before
    # the 64x64 resize — ~1.5x faster cache build; train-data only
    'fast_jpeg_decode': True,
    'optimizer': 'adamw',
    'learning_rate': 2e-4,
    'weight_decay': 1e-4,
    'gradient_accumulation_steps': 1,
    'use_ema': True,
    'ema_decay': 0.9999,
    'cfg_dropout_prob': 0.0,

    'use_scheduler': True,
    'scheduler_type': 'warmup_cosine',
    'warmup_epochs': 10,
    'warmup_start_factor': 0.01,

    'save_dir': './checkpoints/celeba64_unet',
    'save_interval': 25,
    'resume_path': None,

    'sample_dir': './generated_images/celeba64_unet',
    'sample_interval': 25,
    'sample_start_epoch': 50,
    'num_samples': 16,

    'use_swanlab': False,
    'gpu_ids': [0],
    'port': '12355',
    'seed': 42,
}

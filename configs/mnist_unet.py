"""MNIST 28x28 small UNet, unconditional — the CPU-runnable minimum slice
(BASELINE.json config #1). DDPM training + DDIM-50 sampling."""

config = {
    'project_name': 'diffusion-models',
    'experiment_name': 'mnist-unet-ddpm',

    'model_type': 'unet',
    'model_params': {
        'image_size': (28, 28),
        'in_channels': 1,
        'model_channels': 32,
        'out_channels': 1,
        'num_res_blocks': 1,
        'attention_resolutions': (14,),
        'dropout': 0.1,
        'channel_mult': (1, 2, 2),
        'use_attention': True,
    },

    'dataset': 'mnist',
    'data_root': './data',
    'image_size': (28, 28),
    'conditional': False,
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
    'cfg_scale': 0.0,

    'num_inference_steps': 50,
    'ddim_eta': 0.0,

    'epochs': 50,
    'batch_size': 128,
    'num_workers': 4,
    'optimizer': 'adamw',
    'learning_rate': 2e-4,
    'weight_decay': 1e-4,
    'gradient_accumulation_steps': 1,
    'use_ema': True,
    'ema_decay': 0.999,
    'cfg_dropout_prob': 0.0,

    'use_scheduler': True,
    'scheduler_type': 'cosine',
    'warmup_epochs': 2,
    'warmup_start_factor': 0.01,

    'save_dir': './checkpoints/mnist_unet',
    'save_interval': 10,
    'resume_path': None,

    'sample_dir': './generated_images/mnist_unet',
    'sample_interval': 10,
    'sample_start_epoch': 10,
    'num_samples': 16,

    'use_swanlab': False,
    'gpu_ids': [0],
    'port': '12355',
    'seed': 42,
}

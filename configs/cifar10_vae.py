"""Stage-1 KL-VAE for CIFAR-10 latent diffusion (extension — the
reference has no autoencoder stage).

Train this first, then point a diffusion config's `vae_checkpoint` at
`./checkpoints/cifar10_vae/best_model.ckpt` with `latent_diffusion: true`
(see configs/cifar10_latent_unet.py). channel_mult (1, 2) gives
downsample factor f = 2: 32x32x3 pixels -> 16x16x4 latents.
"""

config = {
    'project_name': 'diffusion-models',
    'experiment_name': 'cifar10-vae',

    'model_type': 'vae',
    'model_params': {
        'in_channels': 3,
        'base_channels': 64,
        'channel_mult': [1, 2],
        'latent_channels': 4,
        'num_res_blocks': 2,
        'use_attention': True,
        'dropout': 0.0,
    },

    'dataset': 'cifar10',
    'data_root': './data',
    'image_size': 32,
    'conditional': False,

    'kl_weight': 1e-4,

    'epochs': 100,
    'batch_size': 128,
    'num_workers': 4,
    'optimizer': 'adamw',
    'learning_rate': 1e-4,
    'weight_decay': 1e-4,
    'gradient_accumulation_steps': 1,
    'use_ema': True,
    'ema_decay': 0.999,
    'use_scheduler': True,
    'scheduler_type': 'cosine',

    'save_dir': './checkpoints/cifar10_vae',
    'save_interval': 10,
    'resume_path': None,
    'sample_dir': './generated_images/cifar10_vae',
    'sample_interval': 5,
    'sample_start_epoch': 1,
    'num_samples': 8,

    'use_swanlab': False,
    'seed': 42,
}

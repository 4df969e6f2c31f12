"""Stage-2 latent diffusion for CIFAR-10 (extension — the reference
diffuses in pixel space only).

Requires a trained stage-1 VAE (configs/cifar10_vae.py). The denoiser's
spatial size and channel count come from the VAE checkpoint
(16x16x4 latents for the f=2 CIFAR VAE) — `model_params` deliberately
omits `in_channels`/`out_channels`/image size, which
`factory.get_model` derives from the checkpoint.
"""

config = {
    'project_name': 'diffusion-models',
    'experiment_name': 'cifar10-latent-unet',

    'model_type': 'unet',
    'model_params': {
        'model_channels': 128,
        'num_res_blocks': 2,
        'attention_resolutions': [8, 4],
        'dropout': 0.1,
        'channel_mult': [1, 2, 2],
        'use_attention': True,
    },

    'latent_diffusion': True,
    'vae_checkpoint': './checkpoints/cifar10_vae/best_model.ckpt',
    # rescale latents toward unit variance before diffusing (LDM's sigma
    # normalization; measure std on a few batches and set 1/std here)
    'latent_scale_factor': 1.0,

    'dataset': 'cifar10',
    'data_root': './data',
    'image_size': 32,  # PIXEL size; the latent geometry comes from the VAE
    'conditional': True,
    'num_classes': 10,

    'num_timesteps': 1000,
    'beta_start': 0.0001,
    'beta_end': 0.02,
    'beta_schedule': 'linear',
    'loss_type': 'l2',
    'cfg_scale': 1.8,
    'cfg_dropout_prob': 0.2,

    'num_inference_steps': 50,
    'ddim_eta': 0.0,

    'epochs': 1000,
    'batch_size': 128,
    'num_workers': 4,
    'optimizer': 'adamw',
    'learning_rate': 1e-4,
    'weight_decay': 1e-4,
    'gradient_accumulation_steps': 1,
    'use_ema': True,
    'ema_decay': 0.9999,
    'use_scheduler': True,
    'scheduler_type': 'cosine',

    'save_dir': './checkpoints/cifar10_latent_unet',
    'save_interval': 50,
    'resume_path': None,
    'sample_dir': './generated_images/cifar10_latent_unet',
    'sample_interval': 25,
    'sample_start_epoch': 25,
    'num_samples': 16,

    'use_swanlab': False,
    'seed': 42,
}

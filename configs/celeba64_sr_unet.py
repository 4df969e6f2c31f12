"""CelebA 32->64 super-resolution stage (extension: SR3-style cascaded
diffusion, utils/sr.py). Trains the upsampler half of a cascade: pair it
with a 32x32 base checkpoint through tools/cascade.py, or super-resolve
arbitrary images with `sample.py --sr_source`.

Training pairs are derived from the 64x64 dataset itself: the LR
conditioning is the exact 2x area downsample of each batch, computed
inside the jitted train step. The model consumes [x_t ; upsampled LR]
(6 input channels) and predicts 3-channel eps.
"""

config = {
    'project_name': 'diffusion-models',
    'experiment_name': 'celeba64-sr2x-unet-ddpm',

    'model_type': 'unet',
    'model_params': {
        'image_size': (64, 64),
        'in_channels': 3,      # DATA channels; the factory doubles the
                               # model's input for the LR conditioning
        'model_channels': 128,
        'out_channels': 3,
        'num_res_blocks': 2,
        'attention_resolutions': (16, 8),
        'dropout': 0.1,
        'channel_mult': (1, 2, 2, 4),
        'use_attention': True,
    },

    # SR3 conditioning: LR = 32x32 area downsample, bilinear-upsampled
    # back to 64x64 and channel-concatenated to x_t. noise_aug > 0 adds
    # gaussian conditioning augmentation (Ho et al. 2021 §3.2) — the same
    # fixed level applies at sampling time; it makes cascades robust to
    # the base stage's artifacts.
    'super_resolution': {
        'factor': 2,
        'noise_aug': 0.1,
        'upsample': 'bilinear',
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
    'mixed_precision': 'none',
    'remat': False,
    'cfg_scale': 0.0,

    'num_inference_steps': 50,
    'ddim_eta': 0.0,

    'epochs': 300,
    'batch_size': 256,
    'num_workers': 8,
    'cache_decoded': True,
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

    'save_dir': './checkpoints/celeba64_sr_unet',
    'save_interval': 25,
    'resume_path': None,

    'sample_dir': './generated_images/celeba64_sr_unet',
    'sample_interval': 25,
    'sample_start_epoch': 50,
    'num_samples': 16,

    'use_swanlab': False,
    'gpu_ids': [0],
    'port': '12355',
    'seed': 42,
}

"""Tiny synthetic-data smoke config: runs end-to-end on CPU in seconds.
Used by the CLI integration tests and as a quick install check:

    python train.py --config configs/synthetic_smoke.py
"""

config = {
    'project_name': 'diffusion-models',
    'experiment_name': 'synthetic-smoke',

    'model_type': 'unet',
    'model_params': {
        'image_size': (8, 8),
        'in_channels': 3,
        'model_channels': 16,
        'out_channels': 3,
        'num_res_blocks': 1,
        'attention_resolutions': (4,),
        'dropout': 0.1,
        'channel_mult': (1, 2),
        'use_attention': True,
    },

    'dataset': 'synthetic',
    'data_root': './data',
    'image_size': (8, 8),
    'conditional': True,
    'num_classes': 10,
    'use_subdirs': False,
    'label_file': None,

    'num_timesteps': 50,
    'beta_start': 0.0001,
    'beta_end': 0.02,
    'beta_schedule': 'linear',
    'loss_type': 'l2',
    'cfg_scale': 1.4,

    'num_inference_steps': 10,
    'ddim_eta': 0.0,

    'epochs': 2,
    'batch_size': 32,
    'num_workers': 0,
    'optimizer': 'adamw',
    'learning_rate': 1e-3,
    'weight_decay': 0.0,
    'gradient_accumulation_steps': 1,
    'use_ema': True,
    'ema_decay': 0.99,
    'cfg_dropout_prob': 0.2,

    'use_scheduler': False,

    'save_dir': './checkpoints/synthetic_smoke',
    'save_interval': 2,
    'resume_path': None,

    'sample_dir': './generated_images/synthetic_smoke',
    'sample_interval': 100,
    'sample_start_epoch': 100,
    'num_samples': 4,

    'use_swanlab': False,
    'gpu_ids': [0],
    'port': '12355',
    'seed': 42,
}

"""CIFAR-10 noise-conditional classifier for classifier guidance
(extension — Dhariwal & Nichol 2021). Train it with the SAME schedule
keys as the diffusion model it will guide, then:

    python sample.py --checkpoint <diffusion ckpt> \
        --classifier_checkpoint ./checkpoints/cifar10_classifier/best_model.ckpt \
        --classifier_scale 2.0 --labels 3
"""

config = {
    'project_name': 'diffusion-models',
    'experiment_name': 'cifar10-classifier',

    'model_type': 'classifier',
    'model_params': {
        'in_channels': 3,
        'model_channels': 64,
        'num_res_blocks': 2,
        'attention_resolutions': (8,),
        'dropout': 0.1,
        'channel_mult': (1, 2, 2),
        'use_attention': True,
    },

    'dataset': 'cifar10',
    'data_root': './data',
    'image_size': (32, 32),
    'conditional': True,
    'num_classes': 10,

    # MUST match the diffusion checkpoint's schedule keys — the
    # classifier is trained on the same noisy marginals it guides
    'num_timesteps': 1000,
    'beta_start': 0.0001,
    'beta_end': 0.02,
    'beta_schedule': 'linear',

    'epochs': 100,
    'batch_size': 256,
    'optimizer': 'adamw',
    'learning_rate': 3e-4,
    'weight_decay': 0.05,
    'gradient_accumulation_steps': 1,
    'use_ema': True,
    'ema_decay': 0.999,

    'use_scheduler': True,
    'scheduler_type': 'warmup_cosine',
    'warmup_epochs': 5,
    'warmup_start_factor': 0.01,

    'save_dir': './checkpoints/cifar10_classifier',
    'save_interval': 25,
    'resume_path': None,

    'use_swanlab': False,
    'seed': 42,
}

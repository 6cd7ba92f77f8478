"""Class-conditional synthetic experiment for the conditional-generation
+ CFG end-to-end proof (docs/editing_e2e_cond.md).

Stands in for the reference's ImageNet class-conditional workflow
(U-ViT with a label token, CFG null class K — see
`data/datasets.ImageNet256Features`) at one-chip-minutes scale, using
class-keyed orthonormal latent patterns so conditioning is verifiable by
projection.
"""

from uspace_tpu.configs.common import base_config, d, uvit_nnet

NUM_CLASSES = 6


def get_config():
    config = base_config()
    config.seed = 0
    config.z_shape = (4, 4, 4)
    config.vis_num = 16
    config.train.mode = "cond"
    config.train.n_steps = 8000
    config.train.batch_size = 256
    config.train.log_interval = 100
    config.train.eval_interval = 4000
    config.train.save_interval = 4000
    config.train.ema_rate = 0.999  # short run (see synthetic_attr_e2e)
    config.optimizer.lr = 3e-4
    config.optimizer.weight_decay = 0.0
    config.nnet = uvit_nnet(
        embed_dim=128, depth=6, num_heads=4, img_size=4,
        num_classes=NUM_CLASSES + 1,  # +1: learned CFG null class
        use_checkpoint=False,
    )
    config.dataset = d(name="synthetic_class", num=4096, shape=(4, 4, 8),
                       num_classes=NUM_CLASSES, amp=5.0,
                       cfg=True, p_uncond=0.15)
    config.dl.num_workers = 4
    config.sample.sample_steps = 50
    config.sample.n_samples = 16
    config.sample.mini_batch_size = 64
    config.sample.path = ""
    config.sample.cfg_scale = 1.0
    config.dissection.n_samples = 128
    config.dissection.mini_batch_size = 64
    config.dissection.solver_kwargs.solver_fix_step = 0.02
    return config

"""Attribute-structured synthetic experiment for the end-to-end editing
proof (docs/editing_e2e.md).

Stands in for the reference's CelebA-attr workflow
(`/root/reference/README.md:42-65` steps 1-3: train → read → build
directions → write/steer) at a scale that trains to convergence on one
TPU chip in minutes. The dataset (`data/datasets.SyntheticAttr`) embeds
known orthonormal attribute patterns into the latents, so edits are
verifiable quantitatively (projection onto the pattern), not just by eye.
"""

from uspace_tpu.configs.common import base_config, d, uvit_nnet


def get_config():
    config = base_config()
    config.seed = 0
    config.z_shape = (4, 8, 8)
    config.vis_num = 16
    config.train.n_steps = 3000
    config.train.batch_size = 256
    config.train.log_interval = 100
    config.train.eval_interval = 1500
    config.train.save_interval = 1500
    config.optimizer.lr = 2e-4
    # short run: 0.9999 EMA would still be ~74% random init at 3k steps
    config.train.ema_rate = 0.999
    config.optimizer.weight_decay = 0.0
    config.nnet = uvit_nnet(
        embed_dim=128, depth=6, num_heads=4, img_size=8,
        use_checkpoint=False,
    )
    config.dataset = d(name="synthetic_attr", num=4096, shape=(8, 8, 8),
                       num_attrs=4)
    config.dl.num_workers = 4
    config.sample.sample_steps = 50
    config.sample.n_samples = 16
    config.sample.mini_batch_size = 64
    config.sample.path = ""
    config.dissection.has_attr = True
    config.dissection.n_samples = 256
    config.dissection.mini_batch_size = 64
    config.dissection.write_scales = (-300, -200, -100, 0, 100, 200, 300)
    config.dissection.solver_kwargs.solver_fix_step = 0.02
    return config

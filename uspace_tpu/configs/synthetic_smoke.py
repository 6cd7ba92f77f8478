"""Tiny synthetic config for CPU integration tests and smoke runs
(no reference analog — the reference ships no tests, SURVEY.md §4)."""

from uspace_tpu.configs.common import base_config, d, uvit_nnet


def get_config():
    config = base_config()
    config.seed = 0
    config.z_shape = (4, 8, 8)
    config.vis_num = 4
    config.train.n_steps = 10
    config.train.batch_size = 8
    config.train.log_interval = 5
    config.train.eval_interval = 10
    config.train.save_interval = 5
    config.compute_dtype = "float32"
    config.nnet = uvit_nnet(
        embed_dim=32, depth=2, num_heads=4, img_size=8, use_checkpoint=False
    )
    config.dataset = d(name="synthetic", num=32, shape=(8, 8, 8))
    config.dl.num_workers = 2
    config.sample.sample_steps = 4
    config.sample.n_samples = 4
    config.sample.mini_batch_size = 4
    config.sample.path = ""
    return config

"""MM-CelebA-HQ 256 T2I, U-ViT-large
(reference `configs/lfm_mmcelebahq256_uvit_large.py`)."""

from uspace_tpu.configs.common import base_config, d, uvit_t2i_nnet


def get_config():
    config = base_config()
    config.seed = 1234
    config.train.n_steps = 300_000
    config.train.batch_size = 512
    config.train.mode = "t2i"
    config.optimizer.weight_decay = 0.0
    config.nnet = uvit_t2i_nnet(embed_dim=1024, depth=20, num_heads=16)
    config.dataset = d(
        name="mmcelebahq256_features_withcaptioncontext",
        path="assets/datasets/mmcelebahq256_features",
        cfg=False,
        p_uncond=0.1,
    )
    config.sample.n_samples = 30
    config.sample.mini_batch_size = 10
    config.sample.path = "samples/" + config.dataset.name
    return config

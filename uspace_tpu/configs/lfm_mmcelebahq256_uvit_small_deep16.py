"""MM-CelebA-HQ 256 T2I, U-ViT-small-deep16 from MSCOCO weights
(reference `configs/lfm_mmcelebahq256_uvit_small_deep16.py`)."""

from uspace_tpu.configs.common import base_config, d, uvit_t2i_nnet


def get_config():
    config = base_config()
    config.seed = 1234
    config.pretrained_path = "assets/pretrained_weights/mscoco_uvit_small_deep.pth"
    config.pretrained_surgery = "mscoco_or_in256"
    config.train.n_steps = 1_000_000
    config.train.batch_size = 256
    config.train.mode = "t2i"
    config.optimizer.weight_decay = 0.0
    config.nnet = uvit_t2i_nnet(embed_dim=512, depth=16, num_heads=8)
    config.dataset = d(
        name="mmcelebahq256_features_withcaptioncontext",
        path="assets/datasets/mmcelebahq256_features",
        cfg=False,
        p_uncond=0.1,
    )
    config.sample.n_samples = 30
    config.sample.mini_batch_size = 8
    config.sample.path = "samples/" + config.dataset.name
    return config

"""MM-CelebA-HQ 256 T2I, SD-UNet initialized from an SD LDM checkpoint
(reference `configs/lfm_mmcelebahq256_unet_large.py`)."""

from uspace_tpu.configs.lfm_cm256_unet_large import get_config as _base
from uspace_tpu.configs.common import d


def get_config():
    config = _base()
    config.pretrained_path = "assets/pretrained_weights/sd_unet.pth"
    config.train.n_steps = 3_000_000
    config.train.batch_size = 96
    config.train.mode = "t2i"
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

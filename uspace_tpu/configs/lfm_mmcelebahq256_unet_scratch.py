"""MM-CelebA-HQ 256 T2I, SD-UNet from scratch
(reference `configs/lfm_mmcelebahq256_unet_scratch.py`)."""

from uspace_tpu.configs.lfm_mmcelebahq256_unet_large import get_config as _base


def get_config():
    config = _base()
    config.pretrained_path = None
    config.train.n_steps = 1_000_000
    config.train.batch_size = 256
    return config

"""MM-CelebA-HQ 256 T2I, U-ViT-small-deep16 from scratch
(reference `configs/lfm_mmcelebahq256_uvit_small_deep16_scratch.py`)."""

from uspace_tpu.configs.lfm_mmcelebahq256_uvit_small_deep16 import (
    get_config as _base,
)


def get_config():
    config = _base()
    config.pretrained_path = None
    config.pretrained_surgery = None
    return config

"""CelebAMask-HQ 256, U-ViT-small-deep16 initialized from MSCOCO weights
(reference `configs/lfm_cm256_uvit_small_deep16_fromcoco.py`)."""

from uspace_tpu.configs.lfm_cm256_uvit_small_deep16_scratch import get_config as _base


def get_config():
    config = _base()
    config.pretrained_path = "assets/pretrained_weights/mscoco_uvit_small_deep.pth"
    config.pretrained_surgery = "nnet_only"
    return config

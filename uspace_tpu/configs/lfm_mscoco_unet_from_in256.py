"""MS-COCO T2I, SD-UNet initialized from an SD LDM checkpoint with
cross-attention re-initialized (reference
`configs/lfm_mscoco_unet_from_in256.py`; surgery =
load_sd_unet_remove_attention, utils_uvit.py:168-209)."""

from uspace_tpu.configs.lfm_cm256_unet_large import get_config as _base
from uspace_tpu.configs.common import d


def get_config():
    config = _base()
    config.pretrained_path = "assets/pretrained_weights/sd_unet.pth"
    config.pretrained_surgery = "unet_remove_attention"
    config.train.n_steps = 300_000
    config.train.batch_size = 1024
    config.train.mode = "t2i"
    config.dataset = d(
        name="mscoco256_features",
        path="assets/datasets/coco256_features",
        cfg=False,
        p_uncond=0.1,
    )
    config.sample.n_samples = 16
    config.sample.mini_batch_size = 8
    config.sample.path = "samples/" + config.dataset.name
    return config

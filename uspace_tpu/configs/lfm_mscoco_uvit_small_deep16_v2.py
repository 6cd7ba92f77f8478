"""MS-COCO T2I, U-ViT-small-deep16
(reference `configs/lfm_mscoco_uvit_small_deep16_v2.py`)."""

from uspace_tpu.configs.lfm_mscoco_uvit_from_in256 import get_config as _base
from uspace_tpu.configs.common import uvit_t2i_nnet


def get_config():
    config = _base()
    config.pretrained_path = "assets/pretrained_weights/mscoco_uvit_small_deep.pth"
    config.pretrained_surgery = "mscoco_or_in256"
    config.train.batch_size = 1024
    config.nnet = uvit_t2i_nnet(embed_dim=512, depth=16, num_heads=8)
    return config

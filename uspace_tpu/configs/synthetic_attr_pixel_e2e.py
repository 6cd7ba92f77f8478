"""Pixel-space (no-VAE, from_moments=False) variant of the attribute
editing proof — validates the reference's `train_ffmm.py` data path end
to end on a trained model: raw data batches, the same one-loop trainer,
and the full read→directions→write editing workflow with ground-truth
verifiable attribute patterns (`data/datasets.SyntheticAttr` raw mode).
"""

from uspace_tpu.configs.synthetic_attr_e2e import get_config as _base


def get_config():
    config = _base()
    config.train.from_moments = False
    config.train.grad_clip = 1.0  # train_ffmm.py:144-146
    config.dataset.raw = True
    return config

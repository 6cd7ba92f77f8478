"""Pixel-space flow matching (no VAE) — reference `train_ffmm.py`.
Same loop; batches carry images directly (from_moments=False)."""

from uspace_tpu.configs.common import base_config, d, uvit_nnet


def get_config():
    config = base_config()
    config.seed = 1234
    config.z_shape = (3, 32, 32)  # pixels, CHW convention
    config.train.n_steps = 500_000
    config.train.batch_size = 128
    config.train.from_moments = False
    config.train.grad_clip = 1.0  # train_ffmm.py:144-146
    config.nnet = uvit_nnet(embed_dim=512, depth=12, num_heads=8,
                            img_size=32, in_chans=3)
    config.dataset = d(name="synthetic", num=1024, shape=(32, 32, 3))
    config.sample.n_samples = 10_000  # train_ffmm.py:278-280
    config.sample.mini_batch_size = 100
    return config

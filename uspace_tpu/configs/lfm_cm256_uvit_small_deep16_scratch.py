"""CelebAMask-HQ 256, U-ViT-small-deep16, from scratch — the CPU-runnable
baseline config (reference `configs/lfm_cm256_uvit_small_deep16_scratch.py`,
BASELINE.json config #1)."""

from uspace_tpu.configs.common import base_config, d, uvit_nnet


def get_config():
    config = base_config()
    config.seed = 12340
    config.train.n_steps = 500_000
    config.train.batch_size = 256
    config.nnet = uvit_nnet(embed_dim=512, depth=16, num_heads=8)
    config.dataset = d(
        name="celebamask256_features_cond",
        path="assets/datasets/celebamask256_features_with_supervision",
        cfg=False,
        p_uncond=0.15,
    )
    config.sample.n_samples = 50_000
    config.sample.mini_batch_size = 50
    config.sample.path = "samples/" + config.dataset.name
    config.dissection.has_attr = True
    return config

"""CelebAMask-HQ 256, U-ViT-large — the flagship uncond config
(reference `configs/lfm_cm256_uvit_large.py`)."""

from uspace_tpu.configs.common import base_config, d, uvit_nnet


def get_config():
    config = base_config()
    config.seed = 1234
    config.train.n_steps = 300_000
    config.train.batch_size = 512
    config.optimizer.weight_decay = 0.03
    config.nnet = uvit_nnet(embed_dim=1024, depth=20, num_heads=16)
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
    config.dissection.solver_kwargs.solver = "fixed"
    return config

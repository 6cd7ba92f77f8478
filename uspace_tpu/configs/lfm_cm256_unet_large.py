"""CelebAMask-HQ 256, SD-UNet-large
(reference `configs/lfm_cm256_unet_large.py:43-128`)."""

from uspace_tpu.configs.common import base_config, d


def get_config():
    config = base_config()
    config.seed = 1234
    config.train.n_steps = 300_000
    config.train.batch_size = 512
    config.nnet = d(
        name="unet_t2i",
        image_size=32,
        in_channels=4,
        out_channels=4,
        model_channels=256,
        attention_resolutions=[4, 2, 1],
        num_res_blocks=2,
        channel_mult=[1, 2, 4],
        num_head_channels=32,
        use_spatial_transformer=True,
        transformer_depth=1,
        context_dim=768,
    )
    config.dataset = d(
        name="celebamask256_features_cond",
        path="assets/datasets/celebamask256_features_with_supervision",
        cfg=False,
        p_uncond=0.15,
    )
    config.sample.n_samples = 50_000
    config.sample.mini_batch_size = 50
    config.sample.path = "samples/" + config.dataset.name
    config.dissection.dissect_task = "hspace_unet"
    config.dissection.has_attr = True
    return config

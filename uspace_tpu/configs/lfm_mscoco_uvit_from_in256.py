"""MS-COCO T2I, U-ViT-large initialized from ImageNet256 weights
(reference `configs/lfm_mscoco_uvit_from_in256.py`)."""

from uspace_tpu.configs.common import base_config, d, uvit_t2i_nnet


def get_config():
    config = base_config()
    config.seed = 1230
    config.pretrained_path = (
        "assets/pretrained_weights/imagenet256_uvit_large.pth"
    )
    config.pretrained_surgery = "mscoco_or_in256"
    config.train.n_steps = 300_000
    config.train.batch_size = 256
    config.train.mode = "t2i"
    config.train.log_interval = 10
    config.train.eval_interval = 500
    config.train.save_interval = 5000
    config.optimizer.weight_decay = 0.0
    config.nnet = uvit_t2i_nnet(embed_dim=1024, depth=20, num_heads=16)
    config.dataset = d(
        name="mscoco256_features",
        path="assets/datasets/coco256_features",
        cfg=False,
        p_uncond=0.1,
    )
    config.sample.n_samples = 16
    config.sample.mini_batch_size = 8
    config.sample.path = "samples/" + config.dataset.name
    config.dissection.dissect_task = "uspace_uvit"
    config.dissection.ith_attr = 7
    config.dissection.pca_n = 100
    return config

"""SD-UNet T2I variant of the end-to-end proof: the cross-attention
model family (reference `libs/sd/openaimodel.py` UNetModel, the
mscoco/mmcelebahq unet configs) trained on the same caption-structured
synthetic dataset and verified by `cli/editing_e2e_t2i` (checks 1/3/4;
the joint-attention p2p rescale does not apply to cross-attention)."""

from uspace_tpu.configs.common import base_config, d


def get_config():
    config = base_config()
    config.seed = 0
    config.z_shape = (4, 4, 4)
    config.vis_num = 16
    config.train.mode = "t2i"
    config.train.n_steps = 8000
    config.train.batch_size = 256
    config.train.log_interval = 100
    config.train.eval_interval = 4000
    config.train.save_interval = 4000
    config.train.ema_rate = 0.999
    config.optimizer.lr = 3e-4
    config.optimizer.weight_decay = 0.0
    config.nnet = d(
        name="unet_t2i", image_size=4, in_channels=4, out_channels=4,
        model_channels=64, attention_resolutions=[1, 2], num_res_blocks=1,
        channel_mult=[1, 2], num_head_channels=32,
        use_spatial_transformer=True, transformer_depth=1, context_dim=32,
        use_checkpoint=False,
    )
    config.dataset = d(name="synthetic_t2i", num=4096, shape=(4, 4, 8),
                       vocab=6, num_tokens=8, ctx_dim=32, amp=5.0,
                       cfg=True, p_uncond=0.15)
    config.dl.num_workers = 4
    config.sample.sample_steps = 50
    config.sample.n_samples = 16
    config.sample.mini_batch_size = 64
    config.sample.path = ""
    config.dissection.n_samples = 128
    config.dissection.mini_batch_size = 64
    config.dissection.solver_kwargs.solver_fix_step = 0.02
    return config

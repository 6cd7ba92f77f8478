"""Attribute-structured synthetic experiment, SD-UNet family — the
end-to-end u-space editing proof on the UNet (docs/editing_e2e_unet.md).

The reference's UNet editing lives in ``dissect_helper_unet`` + the
adaptive-solver delta interpolation (`/root/reference/libs/dissection.py:
189-282`, ``interp_ode_unet`` `:73-112`), driven by the
``lfm_cm256_unet_large`` / ``lfm_mmcelebahq256_unet_*`` configs. This
config stands in for those at toy scale: a small self-attention UNet
(``use_spatial_transformer=False`` — the editing pathway is the
ResBlock/mid-block h-space, not cross-attention) trained on the same
attribute-structured synthetic latents as ``synthetic_attr_e2e``, so the
read → attr-directions → write workflow is quantitatively verifiable
against the planted patterns. ``dissection.adaptive_check`` additionally
re-runs a write under the reference's fixadp solve (fixed to ``t_edit``,
dopri5 after — ``flow_matching.py:153-180``), exercising
``editing.specs.interp_grid`` at off-grid times on the trained model.
"""

from uspace_tpu.configs.common import base_config, d


def get_config():
    config = base_config()
    config.seed = 0
    config.z_shape = (4, 8, 8)
    config.vis_num = 16
    config.train.n_steps = 3000
    config.train.batch_size = 256
    config.train.log_interval = 100
    config.train.eval_interval = 1500
    config.train.save_interval = 1500
    config.optimizer.lr = 2e-4
    # short run: 0.9999 EMA would still be ~74% random init at 3k steps
    config.train.ema_rate = 0.999
    config.optimizer.weight_decay = 0.0
    config.nnet = d(
        name="unet_t2i",
        image_size=8,
        in_channels=4,
        out_channels=4,
        model_channels=32,
        num_res_blocks=1,
        attention_resolutions=[2],
        channel_mult=[1, 2],
        num_head_channels=16,
        use_spatial_transformer=False,
    )
    config.dataset = d(name="synthetic_attr", num=4096, shape=(8, 8, 8),
                       num_attrs=4)
    config.dl.num_workers = 4
    config.sample.sample_steps = 50
    config.sample.n_samples = 16
    config.sample.mini_batch_size = 64
    config.sample.path = ""
    config.dissection.dissect_task = "hspace_unet"
    config.dissection.has_attr = True
    config.dissection.n_samples = 256
    config.dissection.mini_batch_size = 64
    # the UNet's mid (h-space) tap has much stronger leverage than the
    # U-ViT's (bottleneck stream): the toy model's attr response
    # saturates past ~|100|, so the sweep stays inside the linear range
    config.dissection.write_scales = (-120, -80, -40, 0, 40, 80, 120)
    config.dissection.solver_kwargs.solver_fix_step = 0.02
    # after the fixed-step sweeps, re-run a write under the reference's
    # fixadp solve (interp_ode_unet): fixed to t_edit, dopri5 after
    config.dissection.adaptive_check = True
    return config

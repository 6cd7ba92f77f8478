"""Config defaults shared by all experiments.

Mirrors the reference's per-experiment ``get_config()`` surface
(`/root/reference/configs/*.py`): the same nested ml_collections blocks
(seed, z_shape, train, optimizer, lr_scheduler, nnet, dynamic, dataset,
dl, sample, dissection[.solver_kwargs/.token_kwargs]) so CLI overrides
(``--config.a.b=v``) carry over unchanged. z_shape stays CHW for surface
parity; the loop converts to NHWC internally.
"""

from __future__ import annotations

import ml_collections


def d(**kwargs):
    return ml_collections.ConfigDict(initial_dictionary=kwargs)


def base_config() -> ml_collections.ConfigDict:
    config = ml_collections.ConfigDict()
    config.seed = 1234
    config.z_shape = (4, 32, 32)  # CHW, reference convention
    config.vis_num = 16
    config.workdir = "workdir"
    config.pretrained_path = config_placeholder_str()
    config.pretrained_surgery = config_placeholder_str()

    config.autoencoder = d(
        pretrained_path="assets/stable-diffusion/autoencoder_kl.pth",
        scale_factor=0.18215,
    )
    config.clip = d(pretrained_path="", max_length=77)

    config.train = d(
        n_steps=500_000,
        batch_size=256,  # global batch
        mode="uncond",  # uncond | cond | t2i
        log_interval=100,
        eval_interval=5000,
        save_interval=10_000,
        ema_rate=0.9999,
        grad_clip=-1.0,  # <=0: off
        profile_dir=config_placeholder_str(),
        from_moments=True,  # batches carry VAE moments, resample per step
    )
    config.optimizer = d(
        name="adam", lr=1e-4, weight_decay=0.03, betas=(0.9, 0.999)
    )
    config.lr_scheduler = d(name="customized", warmup_steps=0)
    config.dynamic = d(sigma_min=1e-4)
    config.dl = d(num_workers=8)
    config.sample = d(
        sample_steps=50,
        n_samples=50_000,
        mini_batch_size=50,
        path="",
        cfg_scale=0.0,  # >0: classifier-free guidance at sampling
        # eval/vis sampling solver. Default keeps the fixed-Euler
        # protocol; set solver="adaptive" to run the reference
        # eval_step's decode default (dopri5 rtol=atol=1e-5,
        # /root/reference/train_lfm.py:200 + flow_matching.py:11-12,38).
        # solver_fix_step <= 0 derives the step from sample_steps.
        # controller: "i" (torchdiffeq classic) | "pi" (fewer NFE at the
        # same tolerance; see core/solvers.odeint_adaptive).
        solver_kwargs=d(
            solver="fixed",
            solver_fix="euler",
            solver_fix_step=-1.0,
            solver_adaptive="dopri5",
            rtol=1e-5,
            atol=1e-5,
            controller="pi",
        ),
    )
    config.parallel = d(dp=-1, fsdp=1, tp=1)  # dp=-1: all remaining devices
    config.compute_dtype = "bfloat16"

    # tuple, not list: ml_collections can CLI-override tuples but not lists
    _scales = (-500, -400, -300, -200, -100, -50, -10, 0,
               10, 50, 100, 200, 300, 400, 500)
    config.dissection = d(
        has_attr=False,
        dissect_task="uspace_uvit",
        dissect_name=config_placeholder_str(),
        n_samples=100,
        mini_batch_size=100,
        ckpt_path_to_dissect="",
        fixed_z_path="",
        read_path_root="dissect/read",
        write_path_root="",
        vis_path="",
        write_scales=_scales,
        ith_component=1,
        pca_n=50,
        ith_attr=0,
        class_label=0,  # class-cond models: label used by write/vis modes
        t_edit=1.0,
        e2e_min_effect=1.0,  # editing_e2e pass bar (batch-σ units)
        edit_loc=config_placeholder_str(),
        solver_kwargs=d(
            solver="fixed",
            solver_fix="euler",
            solver_fix_step=0.01,
            solver_adaptive="dopri5",
            solver_adaptive_prec=0.01,
        ),
        token_kwargs=d(
            token_dissect=config_placeholder_str(),
            lp_replace_from="",
            lp_replace_to="",
            lp_to_add="",
            lp_to_remove="",
            p2p_to_multiply="",
            p2p_multiplier=1.9,
            target_block_id=-1,  # -1: all blocks
        ),
    )
    return config


def config_placeholder_str():
    """None-able string field (ml_collections needs typed placeholders)."""
    import ml_collections

    return ml_collections.config_dict.placeholder(str)


def context_shape(config):
    """[tokens, dim] of the conditioning context for t2i-mode inits.

    U-ViT-T2I declares num_clip_token/clip_dim; the SD-UNet family only
    declares context_dim (token count is free), so fall back to the
    dataset's num_tokens (synthetic) or the CLIP default 77."""
    nnet = config.nnet
    tokens = nnet.get("num_clip_token", None)
    if tokens is None:
        dataset = config.get("dataset", None)
        tokens = (dataset.get("num_tokens", None) if dataset is not None
                  else None) or 77
    dim = nnet.get("clip_dim", None) or nnet.get("context_dim", None) or 768
    return int(tokens), int(dim)


def uvit_nnet(embed_dim=512, depth=16, num_heads=8, **kw):
    cfg = d(
        name="uvit", img_size=32, patch_size=2, in_chans=4,
        embed_dim=embed_dim, depth=depth, num_heads=num_heads,
        mlp_ratio=4.0, qkv_bias=False, mlp_time_embed=False,
        num_classes=-1, use_checkpoint=True, remat_exempt=0,
    )
    cfg.update(kw)
    return cfg


def uvit_t2i_nnet(embed_dim=1024, depth=20, num_heads=16, **kw):
    cfg = d(
        name="uvit_t2i", img_size=32, patch_size=2, in_chans=4,
        embed_dim=embed_dim, depth=depth, num_heads=num_heads,
        mlp_ratio=4.0, qkv_bias=False, mlp_time_embed=False,
        clip_dim=768, num_clip_token=77, use_checkpoint=True,
        remat_exempt=0,
    )
    cfg.update(kw)
    return cfg


def nnet_kwargs(nnet_cfg, compute_dtype=None) -> dict:
    """Config block -> model constructor kwargs (drops registry-only and
    reference-legacy fields; maps dtype)."""
    import jax.numpy as jnp

    kw = dict(nnet_cfg)
    kw.pop("name", None)
    kw.pop("use_latent1d", None)
    kw.pop("latent_1d_pooling", None)
    kw.pop("use_fp16", None)  # dtype policy comes from compute_dtype
    if compute_dtype is not None:
        kw["dtype"] = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            compute_dtype
        ]
    if "mlp_ratio" in kw:
        kw["mlp_ratio"] = float(kw["mlp_ratio"])
    return kw


def z_shape_hwc(config) -> tuple:
    c, h, w = config.z_shape
    return (h, w, c)

"""Caption-structured synthetic T2I experiment for the end-to-end
prompt-to-prompt editing proof (docs/editing_e2e_t2i.md).

Stands in for the reference's MSCOCO/MM-CelebA T2I workflow
(`/root/reference/dissect_lfm_t2i.py`: p2p rescale, local_prompt rewrite)
at one-chip-minutes scale. The dataset (`data/datasets.SyntheticT2I`)
plants per-word orthonormal latent patterns keyed by the context tokens,
so conditioning and attention edits are verifiable by projection, not by
eye.
"""

from uspace_tpu.configs.common import base_config, d, uvit_t2i_nnet


def get_config():
    config = base_config()
    config.seed = 0
    config.z_shape = (4, 4, 4)
    config.vis_num = 16
    config.train.mode = "t2i"
    config.train.n_steps = 16000
    config.train.batch_size = 256
    config.train.log_interval = 100
    config.train.eval_interval = 8000
    config.train.save_interval = 8000
    config.optimizer.lr = 3e-4
    # short run: 0.9999 EMA lags badly (the dissect loader prefers EMA)
    config.train.ema_rate = 0.999
    config.optimizer.weight_decay = 0.0
    config.nnet = uvit_t2i_nnet(
        embed_dim=128, depth=6, num_heads=4, img_size=4,
        clip_dim=32, num_clip_token=8, use_checkpoint=False,
    )
    # 4x4x4 latents + amp 5: conditioning information is worth ~13% of
    # the CFM loss (at 8x8x4/amp 1.5 it is ~2-3% and a small model simply
    # ignores the context; see docs/editing_e2e_t2i.md)
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
    config.dissection.token_kwargs.p2p_multiplier = 0.0
    return config

"""End-to-end u-space editing on a *trained* SD-UNet (VERDICT r3 #3).

The reference's UNet editing is ``dissect_helper_unet`` + adaptive-solver
delta interpolation (`/root/reference/libs/dissection.py:189-282`,
``interp_ode_unet`` `:73-112`), used by its ``lfm_*_unet_*`` configs.
This trains the toy self-attention UNet (configs/synthetic_attr_unet_e2e)
on the attribute-structured synthetic latents and runs the full read ->
attr-directions -> write workflow via ``cli/editing_e2e.run`` at the
UNet's mid (h-space) tap — including writes under pure-dopri5 and fixadp
solves, which evaluate ``editing.specs.interp_grid`` at off-grid times
on the trained model.
"""

import numpy as np
import pytest


def _unet_e2e_config():
    from uspace_tpu.configs.synthetic_attr_unet_e2e import get_config

    cfg = get_config()
    cfg.compute_dtype = "float32"
    cfg.train.ema_rate = 0.99  # toy-length run: EMA must converge
    cfg.train.n_steps = 800
    cfg.train.batch_size = 64
    cfg.train.log_interval = 200
    cfg.train.eval_interval = 400
    cfg.train.save_interval = 400
    cfg.nnet.model_channels = 32
    cfg.dataset.num = 1024
    cfg.dataset.num_attrs = 2
    cfg.dl.num_workers = 2
    cfg.sample.n_samples = 4
    cfg.sample.mini_batch_size = 4
    cfg.sample.sample_steps = 8
    cfg.dissection.n_samples = 96
    cfg.dissection.mini_batch_size = 48
    # the mid-tap response saturates past ~|50-75| on this toy UNet
    # (measured: rises to +50 then dips at +100 — e.g. 0.672 -> 0.563
    # on the latentz projection at 800 train steps), so the sweep stays
    # inside the monotone regime; the 3k-step run
    # (docs/editing_e2e_unet.md) sweeps the wider range
    cfg.dissection.write_scales = (-60.0, -30.0, 0.0, 30.0, 60.0)
    cfg.dissection.solver_kwargs.solver_fix_step = 0.1
    # same rationale as the U-ViT toy test: monotone 1.0 on paired noise
    # is the load-bearing assertion; the 3k-step run
    # (docs/editing_e2e_unet.md) holds the full 1-sigma bar
    cfg.dissection.e2e_min_effect = 0.5
    return cfg


@pytest.mark.slow
def test_trained_unet_editing_end_to_end(tmp_path):
    from uspace_tpu.cli.editing_e2e import run
    from uspace_tpu.train.loop import train

    cfg = _unet_e2e_config()
    train_wd = str(tmp_path / "train")
    train(cfg, train_wd)
    cfg.dissection.ckpt_path_to_dissect = train_wd + "/ckpts"
    report = run(cfg, str(tmp_path / "e2e"))

    assert report["nnet"] == "unet_t2i"
    for rec in report["attrs"]:
        assert rec["effect_size"] >= 0.5, rec
        # saturation-aware: the mid tap's strong leverage saturates the
        # toy model's OWN ground-truth response at the sweep ends (gt
        # monotone fraction < 1 with gt_agrees True); the gate judges
        # the edit only on the gt-monotone scale pairs
        assert rec["monotone_fraction_supported"] >= 0.9, rec
        assert rec["gt_agrees"], rec
    # the adaptive-solver writes (interp_grid at off-grid t) must move
    # the attribute the same way, at comparable magnitude, as the
    # fixed-step write with the identical edit
    assert len(report["adaptive_checks"]) == 2
    solvers = {c["solver"] for c in report["adaptive_checks"]}
    assert solvers == {"adaptive", "fixadp"}
    for c in report["adaptive_checks"]:
        assert c["agrees"], c
    assert report["passed"]
    assert report["roundtrip"]["rel_mean"] < 0.5

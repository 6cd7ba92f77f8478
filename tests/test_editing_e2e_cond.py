"""Class-conditional end-to-end proof on a trained model: label-token
conditioning + CFG with the learned null class, verified on a U-ViT
genuinely trained on class-keyed synthetic patterns."""

import numpy as np
import pytest


def test_synthetic_class_dataset_structure():
    from uspace_tpu.data.datasets import get_dataset

    ds = get_dataset(name="synthetic_class", num=64, shape=(4, 4, 8),
                     num_classes=4, cfg=True, p_uncond=1.0)
    assert ds.K == 4 and ds.has_label and ds.null_label == 4
    s = ds.train[3]
    assert s["x"].shape == (4, 4, 8)
    assert int(s["y"]) == 4  # p_uncond=1.0: every label dropped to null

    base = ds.test  # un-wrapped features
    y = base.label_of(3)
    proj = base._pat.reshape(4, -1) @ base.latent_of(3).ravel()
    assert int(np.argmax(proj)) == y
    assert proj[y] > 3.0


def test_null_cond_uses_learned_null_class():
    """Regression: CFG null must be class K (the learned null), not K-1
    (a real class) — found while building this proof."""
    import jax.numpy as jnp
    from uspace_tpu.configs.synthetic_cond_e2e import get_config
    from uspace_tpu.train.loop import Experiment

    cfg = get_config()
    cfg.dataset.num = 8
    tr = Experiment(cfg, "/tmp/nullcond_probe")
    null = tr.null_cond({"y": jnp.zeros((3,), jnp.int32)})
    assert int(null["y"][0]) == cfg.dataset.num_classes  # == K, not K-1


def _cond_config():
    from uspace_tpu.configs.synthetic_cond_e2e import get_config

    cfg = get_config()
    cfg.compute_dtype = "float32"
    cfg.train.ema_rate = 0.99
    cfg.train.n_steps = 1500
    cfg.train.batch_size = 64
    cfg.train.log_interval = 500
    cfg.train.eval_interval = 1500
    cfg.train.save_interval = 1500
    cfg.optimizer.lr = 8e-4
    cfg.nnet.embed_dim = 64
    cfg.nnet.depth = 4
    cfg.nnet.num_classes = 5  # 4 classes + null
    cfg.dataset.num = 2048
    cfg.dataset.num_classes = 4
    cfg.dl.num_workers = 2
    cfg.sample.n_samples = 4
    cfg.sample.mini_batch_size = 4
    cfg.sample.sample_steps = 8
    cfg.dissection.mini_batch_size = 24
    cfg.dissection.solver_kwargs.solver_fix_step = 0.1
    return cfg


@pytest.mark.slow
def test_trained_cond_model_end_to_end(tmp_path):
    from uspace_tpu.cli.editing_e2e_cond import run
    from uspace_tpu.train.loop import train

    cfg = _cond_config()
    train_wd = str(tmp_path / "train")
    train(cfg, train_wd)
    cfg.dissection.ckpt_path_to_dissect = train_wd + "/ckpts"
    report = run(cfg, str(tmp_path / "e2e"))

    for r in report["checks"]["conditioning"]["rows"]:
        assert r["margin_sigma"] >= 2.0, r
        assert r["own_mean"] > r["other_mean"] + 0.5, r
    cg = report["checks"]["cfg_guidance"]
    assert abs(cg["margins"][0]) < 0.5 * cg["margins"][1], cg
    assert cg["margins"][2] >= 0.9 * cg["margins"][1], cg
    assert (tmp_path / "e2e" / "cond_grid.png").exists()

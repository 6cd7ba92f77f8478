"""T2I end-to-end proof on a trained model: conditioning, p2p rescale,
local-prompt rewrite — the `dissect_lfm_t2i` repertoire verified against
a U-ViT-T2I genuinely trained on the caption-structured synthetic
dataset (`data/datasets.SyntheticT2I`), not random weights."""

import numpy as np
import pytest


def test_synthetic_t2i_dataset_structure():
    from uspace_tpu.data.datasets import get_dataset

    ds = get_dataset(name="synthetic_t2i", num=64, shape=(8, 8, 8),
                     vocab=4, num_tokens=6, ctx_dim=16)
    s = ds.train[3]
    assert s["x"].shape == (8, 8, 8)
    assert s["context"].shape == (6, 16)
    w1, w2 = (int(w) for w in s["words"])
    assert w1 != w2

    # context rows 1/2 carry the (scaled) word embeddings, others zero
    E = ds.train.word_embeddings(16, 4)
    np.testing.assert_allclose(s["context"][1], ds.train.ctx_scale * E[w1],
                               rtol=1e-5)
    np.testing.assert_allclose(s["context"][2], ds.train.ctx_scale * E[w2],
                               rtol=1e-5)
    assert np.all(s["context"][[0, 3, 4, 5]] == 0)
    # embeddings orthonormal
    g = E @ E.T
    assert np.abs(g - np.eye(4)).max() < 1e-5

    # the latent carries exactly the two words' patterns
    P = ds.train._pat
    proj = P.reshape(4, -1) @ ds.train.latent_of(3).ravel()
    present = sorted(np.argsort(proj)[-2:])
    assert present == sorted([w1, w2])

    # CFG null context exists and is zero
    assert ds.empty_context.shape == (6, 16)
    assert np.all(ds.empty_context == 0)


def _t2i_config():
    from uspace_tpu.configs.synthetic_t2i_e2e import get_config

    cfg = get_config()
    cfg.compute_dtype = "float32"
    cfg.train.ema_rate = 0.99  # toy-length run: EMA must converge
    cfg.train.n_steps = 2500
    cfg.train.batch_size = 64
    cfg.train.log_interval = 500
    cfg.train.eval_interval = 2500
    cfg.train.save_interval = 2500
    cfg.nnet.embed_dim = 64
    cfg.nnet.depth = 4
    cfg.nnet.num_clip_token = 6
    cfg.nnet.clip_dim = 16
    cfg.dataset.num = 2048
    cfg.dataset.vocab = 4
    cfg.dataset.num_tokens = 6
    cfg.dataset.ctx_dim = 16
    cfg.optimizer.lr = 8e-4
    cfg.dl.num_workers = 2
    cfg.sample.n_samples = 4
    cfg.sample.mini_batch_size = 4
    cfg.sample.sample_steps = 8
    cfg.dissection.mini_batch_size = 24
    cfg.dissection.solver_kwargs.solver_fix_step = 0.1
    return cfg


@pytest.mark.slow
def test_trained_t2i_editing_end_to_end(tmp_path):
    from uspace_tpu.cli.editing_e2e_t2i import run
    from uspace_tpu.train.loop import train

    cfg = _t2i_config()
    train_wd = str(tmp_path / "train")
    train(cfg, train_wd)
    cfg.dissection.ckpt_path_to_dissect = train_wd + "/ckpts"
    report = run(cfg, str(tmp_path / "e2e"))

    # toy-scale bars (the TPU-scale run in docs/editing_e2e_t2i.md holds
    # the harness's full thresholds): conditioning must separate present
    # from absent words, p2p suppression must cut the target word's
    # content monotonically, and the rewrite must swap the patterns
    for r in report["checks"]["conditioning"]["rows"]:
        assert r["margin_sigma"] >= 2.0, r
        assert r["present_mean"] > r["absent_mean"] + 0.3, r
    p2p = report["checks"]["p2p_rescale"]
    assert p2p["monotone"], p2p
    assert p2p["target_drop_mult0"] > 0.15, p2p
    lp = report["checks"]["local_prompt"]
    assert lp["new_word_after"] > lp["new_word_before"] + 0.3, lp
    assert lp["old_word_before"] > lp["old_word_after"] + 0.3, lp
    cg = report["checks"]["cfg_guidance"]
    # s=0 erases the caption margin; s=3 at least matches s=1
    assert abs(cg["margins"][0]) < 0.5 * cg["margins"][1], cg
    assert cg["margins"][2] >= 0.9 * cg["margins"][1], cg
    assert (tmp_path / "e2e" / "t2i_sweeps.png").exists()


@pytest.mark.slow
def test_unet_int8_view_quality_gate_on_trained_weights(tmp_path):
    """The UNet analogue of the U-ViT trained-weights int8 gate
    (test_editing_e2e.py): the W8A8 failure mode — per-channel
    activation outliers — emerges with training, so the Int8Conv view
    must be gated on a genuinely trained SD-UNet, not random init. Toy
    unet_t2i (configs/synthetic_t2i_unet_e2e) trained briefly, then the
    full sampling ODE compared int8-vs-f32 from shared noise."""
    import jax
    import jax.numpy as jnp

    from uspace_tpu.configs.common import nnet_kwargs
    from uspace_tpu.configs.synthetic_t2i_unet_e2e import get_config
    from uspace_tpu.core import flow
    from uspace_tpu.models import get_nnet
    from uspace_tpu.train.loop import train

    cfg = get_config()
    cfg.compute_dtype = "float32"
    cfg.train.ema_rate = 0.99
    cfg.train.n_steps = 250
    cfg.train.batch_size = 64
    cfg.train.log_interval = 250
    cfg.train.eval_interval = 250
    cfg.train.save_interval = 250
    cfg.dataset.num = 512
    cfg.dl.num_workers = 2
    cfg.sample.n_samples = 4
    cfg.sample.mini_batch_size = 4
    cfg.sample.sample_steps = 8
    state = train(cfg, str(tmp_path / "train"))
    params = {"params": state.ema_params["params"]}

    kw = nnet_kwargs(cfg.nnet)
    model = get_nnet(cfg.nnet.name, **kw)
    model_q = get_nnet(cfg.nnet.name, **kw, quant=True)
    ds_shape = tuple(cfg.dataset.shape)
    z = jax.random.normal(jax.random.PRNGKey(7),
                          (8, ds_shape[0], ds_shape[1], ds_shape[2] // 2))
    ctx = jax.random.normal(jax.random.PRNGKey(8),
                            (8, cfg.dataset.num_tokens, cfg.dataset.ctx_dim))
    ode = {"solver": "fixed", "solver_fix": "euler", "solver_fix_step": 0.125}
    a = flow.decode(lambda t, x: model.apply(params, x, t, ctx)[0], z, ode)
    b = flow.decode(lambda t, x: model_q.apply(params, x, t, ctx)[0], z, ode)
    af = np.asarray(a, np.float64).ravel()
    bf = np.asarray(b, np.float64).ravel()
    cos = af @ bf / (np.linalg.norm(af) * np.linalg.norm(bf))
    rel = np.linalg.norm(af - bf) / np.linalg.norm(af)
    assert cos > 0.99, (cos, rel)
    assert rel < 0.15, (cos, rel)
    assert jnp.isfinite(jnp.asarray(bf)).all()

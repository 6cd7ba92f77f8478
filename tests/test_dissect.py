"""Integration tests for the dissection drivers: the full read ->
build-directions -> write-sweep pipeline and the T2I editing flows, on
tiny synthetic data (the reference has no tests for any of this)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uspace_tpu.configs.common import base_config, d, uvit_nnet, uvit_t2i_nnet


def _uncond_config(data_dir):
    cfg = base_config()
    cfg.seed = 0
    cfg.z_shape = (4, 8, 8)
    cfg.compute_dtype = "float32"
    cfg.nnet = uvit_nnet(embed_dim=32, depth=2, num_heads=4, img_size=8,
                         use_checkpoint=False)
    cfg.dataset = d(name="celebamask256_features_cond", path=data_dir, num=8)
    cfg.dl.num_workers = 1
    cfg.dissection.mini_batch_size = 4
    cfg.dissection.n_samples = 8
    cfg.dissection.solver_kwargs.solver_fix_step = 0.25  # 4-step grid
    cfg.dissection.write_scales = (-1.0, 0.0, 1.0)
    return cfg


@pytest.fixture
def cond_feature_dir(tmp_path, np_rng):
    droot = tmp_path / "feats"
    droot.mkdir()
    for i in range(8):
        z = np_rng.normal(size=(8, 8, 8)).astype(np.float32)  # moments CHW
        seg = np.zeros((8, 8), np.uint8)
        attr = (np_rng.random(4) > 0.5).astype(np.int64)
        np.save(droot / f"{i}.npy", np.array((z, seg, attr), dtype=object),
                allow_pickle=True)
    return str(droot)


class TestDissectLfmPipeline:
    def test_read_build_write(self, tmp_path, cond_feature_dir):
        from uspace_tpu.cli.dissect_lfm import run

        cfg = _uncond_config(cond_feature_dir)
        cfg.dissection.read_path_root = str(tmp_path / "read")
        wd = str(tmp_path / "out")

        cfg.dissection.dissect_name = "read"
        run(cfg, wd)
        npz = np.load(tmp_path / "read" / "read.npz")
        assert npz["latent"].shape == (8, 8, 8, 4)
        assert npz["feats"].shape[0] == 8 and npz["feats"].shape[1] == 4
        assert npz["attr"].shape == (8, 4)

        cfg.dissection.dissect_name = "build_attr"
        run(cfg, wd)
        dirs = np.load(tmp_path / "read" / "directions_attr.npz")
        assert dirs["directions"].shape[:2] == (4, 4)  # [T, A, ...]

        cfg.dissection.dissect_name = "build_pca"
        cfg.dissection.pca_n = 2
        run(cfg, wd)
        dirs = np.load(tmp_path / "read" / "directions_pca.npz")
        assert dirs["directions"].shape[:2] == (4, 2)

        cfg.dissection.dissect_name = "write_attr"
        cfg.dissection.ith_attr = 1
        run(cfg, wd)
        assert os.path.exists(wd + "/write_attr_sweep.png")

        cfg.dissection.dissect_name = "write_pca"
        cfg.dissection.ith_component = 0
        run(cfg, wd)
        assert os.path.exists(wd + "/write_pca_sweep.png")

        cfg.dissection.dissect_name = "write_x0"
        run(cfg, wd)
        assert os.path.exists(wd + "/write_x0_sweep.png")

        cfg.dissection.dissect_name = "vis_reversible"
        run(cfg, wd)
        lines = open(wd + "/delta_change.txt").read().strip().splitlines()
        assert len(lines) == 1 and "rel_mean=" in lines[0]


class TestBf16ReadArtifact:
    def test_read_npz_is_float32_under_bf16_compute(self, tmp_path,
                                                    cond_feature_dir):
        """Regression (found on TPU): a bfloat16 compute model used to
        poison read.npz with ml_dtypes bf16 arrays, which np.save stores
        as raw void ('|V2') — unloadable. The read artifact must be f32
        and build_directions must work from it."""
        from uspace_tpu.cli.dissect_lfm import run

        cfg = _uncond_config(cond_feature_dir)
        cfg.compute_dtype = "bfloat16"
        cfg.dissection.read_path_root = str(tmp_path / "read")
        cfg.dissection.dissect_name = "read"
        run(cfg, str(tmp_path / "out"))
        npz = np.load(tmp_path / "read" / "read.npz")
        assert npz["feats"].dtype == np.float32
        assert npz["latent"].dtype == np.float32
        cfg.dissection.dissect_name = "build_attr"
        run(cfg, str(tmp_path / "out"))
        dirs = np.load(tmp_path / "read" / "directions_attr.npz")
        assert np.isfinite(dirs["directions"]).all()


@pytest.fixture
def t2i_feature_dir(tmp_path, np_rng):
    droot = tmp_path / "t2i"
    for split in ("train", "val"):
        sd = droot / split
        sd.mkdir(parents=True)
        for i in range(4):
            np.save(sd / f"{i}.npy",
                    np_rng.normal(size=(8, 8, 8)).astype(np.float32))
            np.save(sd / f"{i}_0.npy",
                    np_rng.normal(size=(5, 16)).astype(np.float32))
            (sd / f"{i}_0_captions.txt").write_text("ab cd\n")
    np.save(droot / "empty_context.npy",
            np.zeros((5, 16), np.float32))
    return str(droot)


def _t2i_config(data_dir):
    cfg = base_config()
    cfg.seed = 0
    cfg.z_shape = (4, 8, 8)
    cfg.compute_dtype = "float32"
    cfg.train.mode = "t2i"
    cfg.nnet = uvit_t2i_nnet(embed_dim=32, depth=2, num_heads=4, img_size=8,
                             clip_dim=16, num_clip_token=5,
                             use_checkpoint=False)
    cfg.dataset = d(name="mscoco256_features", path=data_dir, cfg=False,
                    p_uncond=0.1, output_caption=True,
                    expected_sizes=None)
    cfg.dl.num_workers = 1
    cfg.dissection.mini_batch_size = 2
    cfg.dissection.solver_kwargs.solver_fix_step = 0.25
    return cfg


class _CharTok:
    def encode(self, text):
        return [0] + [ord(c) for c in text.replace(" ", "")] + [1]

    def decode(self, items):
        return "".join(chr(i) for i in items)


class TestDissectT2I:
    def test_p2p_real_image_editing(self, tmp_path, t2i_feature_dir):
        from uspace_tpu.cli.dissect_common import build_session
        from uspace_tpu.cli.dissect_lfm_t2i import real_image_editing

        cfg = _t2i_config(t2i_feature_dir)
        cfg.dissection.dissect_name = "p2p"
        cfg.dissection.token_kwargs.p2p_to_multiply = "cd"
        cfg.dissection.token_kwargs.p2p_multiplier = 4.0
        wd = str(tmp_path / "p2p")
        os.makedirs(wd)
        session, vae_decode = build_session(cfg)
        real_image_editing(cfg, session, vae_decode, wd,
                           clip=None, tokenizer=_CharTok())
        assert os.path.exists(wd + "/0_before.png")
        assert os.path.exists(wd + "/0_after.png")
        assert "->" in open(wd + "/0_caption.txt").read()

    def test_p2p_requires_tokenizer(self, tmp_path, t2i_feature_dir):
        from uspace_tpu.cli.dissect_common import build_session
        from uspace_tpu.cli.dissect_lfm_t2i import real_image_editing

        cfg = _t2i_config(t2i_feature_dir)
        cfg.dissection.dissect_name = "p2p"
        session, vae_decode = build_session(cfg)
        with pytest.raises(RuntimeError, match="tokenizer"):
            real_image_editing(cfg, session, vae_decode, str(tmp_path),
                               clip=None, tokenizer=None)

    def test_sampled_image_editing_sweep(self, tmp_path, t2i_feature_dir):
        from uspace_tpu.cli.dissect_lfm_t2i import run

        cfg = _t2i_config(t2i_feature_dir)
        cfg.dissection.dissect_name = "sampled_image_editing"
        cfg.dissection.token_kwargs.p2p_to_multiply = ""
        cfg.dissection.token_kwargs.p2p_multiplier = 1.0
        wd = str(tmp_path / "sie")
        run(cfg, wd)
        assert os.path.exists(wd + "/sampled_editing_sweep.png")
        assert os.path.exists(wd + "/captions.txt")


class TestVisAttention:
    def test_vis_attention_writes_heatmaps(self, tmp_path, t2i_feature_dir):
        from uspace_tpu.cli.dissect_lfm_t2i import run

        cfg = _t2i_config(t2i_feature_dir)
        cfg.dissection.dissect_name = "vis_attention"
        wd = str(tmp_path / "va")
        run(cfg, wd)
        import glob

        pngs = glob.glob(wd + "/*.png")
        assert pngs, os.listdir(wd)


class TestProvenance:
    def test_update_config_derives_paths(self, t2i_feature_dir):
        from uspace_tpu.configs.provenance import (
            epoch_id_from_path,
            solver_desc,
            update_config,
        )

        cfg = _t2i_config(t2i_feature_dir)
        cfg.dataset.name = "mscoco256_features"
        cfg.dissection.dissect_name = "write_attr"
        cfg.dissection.ckpt_path_to_dissect = "workdir/x/ckpts/130000.ckpt/nnet.pth"
        cfg.dissection.vis_path = None
        cfg.dissection.read_path_root = None
        update_config(cfg)
        assert "ep130000" in cfg.dissection.vis_path
        assert "euler_step0.25" in cfg.dissection.read_path_root
        assert epoch_id_from_path("a/ckpts/500") == 500
        assert solver_desc({"solver": "adaptive",
                            "solver_adaptive": "dopri5"}) == "dopri5"


class TestFixedZEditing:
    def test_write_with_fixed_z_from_read(self, tmp_path, cond_feature_dir):
        """Real-image editing: steer from inverted latents of real images
        (fixed_z_path='from_read') instead of fresh noise."""
        from uspace_tpu.cli.dissect_lfm import run

        cfg = _uncond_config(cond_feature_dir)
        cfg.dissection.read_path_root = str(tmp_path / "read")
        wd = str(tmp_path / "out")
        cfg.dissection.dissect_name = "read"
        run(cfg, wd)
        cfg.dissection.dissect_name = "build_attr"
        run(cfg, wd)
        cfg.dissection.dissect_name = "write_attr"
        cfg.dissection.ith_attr = 0
        cfg.dissection.fixed_z_path = "from_read"
        run(cfg, wd)
        assert os.path.exists(wd + "/write_attr_sweep.png")


class TestCheckpointInterop:
    @pytest.mark.slow
    def test_dissect_loads_framework_trained_checkpoint(self, tmp_path):
        """Regression: dissect/export must open checkpoints written by
        train() regardless of the training optimizer's state structure."""
        from uspace_tpu.cli.dissect_common import load_nnet_params
        from uspace_tpu.configs.synthetic_smoke import get_config
        from uspace_tpu.configs.common import nnet_kwargs
        from uspace_tpu.models import get_nnet
        from uspace_tpu.train.loop import train

        cfg = get_config()
        cfg.train.n_steps = 5
        cfg.train.save_interval = 5
        cfg.train.eval_interval = 100
        cfg.optimizer.weight_decay = 0.03   # extra optax chain element
        cfg.lr_scheduler.warmup_steps = 2   # schedule state
        wd = str(tmp_path / "run")
        train(cfg, wd)

        cfg.dissection.ckpt_path_to_dissect = wd + "/ckpts"
        model = get_nnet(cfg.nnet.name, **nnet_kwargs(cfg.nnet))
        x = jnp.zeros((1, 8, 8, 4))
        t = jnp.zeros((1,))
        params = load_nnet_params(cfg, model, (x, t))
        v, _ = model.apply(jax.tree.map(jnp.asarray, params), x, t)
        assert v.shape == x.shape
        assert np.isfinite(np.asarray(v)).all()

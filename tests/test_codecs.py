"""Codec tests: VAE module shapes + numerical parity of the Flax VAE and
U-ViT against the PyTorch reference implementation (random weights routed
through the converter). Parity tests skip when /root/reference is absent.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uspace_tpu.codecs.convert import (
    merge_params,
    uvit_torch_to_flax,
    vae_torch_to_flax,
)
from uspace_tpu.codecs.vae import SD_CONFIG, AutoencoderKL

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "libs"))

TINY_DD = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
               attn_resolutions=(), in_channels=3, resolution=32,
               z_channels=4, double_z=True)


def _ref_modules():
    import importlib.util

    sys.path.insert(0, REF)
    spec = importlib.util.spec_from_file_location(
        "ref_autoencoder", os.path.join(REF, "libs", "autoencoder.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestVAEModule:
    def test_shapes_roundtrip(self, rng):
        vae = AutoencoderKL(ddconfig=TINY_DD, embed_dim=4)
        x = jax.random.normal(rng, (2, 32, 32, 3))
        params = vae.init(rng, x, rng)
        moments = vae.apply(params, x, method=vae.encode_moments)
        assert moments.shape == (2, 16, 16, 8)
        z = vae.apply(params, moments, rng, method=vae.sample)
        assert z.shape == (2, 16, 16, 4)
        dec = vae.apply(params, z, method=vae.decode)
        assert dec.shape == (2, 32, 32, 3)

    def test_int8_decode_view(self, rng):
        """quant=True decode view: identical param tree to the plain
        view (any converted checkpoint loads into either), output close
        to the f32 decode. Real-SD-weights gate: evals/asset_validation.
        validate_vae + tests/test_assets.py (asset-gated)."""
        vae = AutoencoderKL(ddconfig=TINY_DD, embed_dim=4)
        vae_q = AutoencoderKL(ddconfig=TINY_DD, embed_dim=4, quant=True)
        x = jax.random.normal(rng, (2, 32, 32, 3))
        params = vae.init(rng, x, rng)
        params_q = vae_q.init(rng, x, rng)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(params_q))
        assert all(a.shape == b.shape and a.dtype == b.dtype
                   for a, b in zip(jax.tree_util.tree_leaves(params),
                                   jax.tree_util.tree_leaves(params_q)))
        z = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, 16, 4))
        dec = np.asarray(vae.apply(params, z, method=vae.decode), np.float64)
        dec_q = np.asarray(vae_q.apply(params, z, method=vae_q.decode),
                           np.float64)
        rel = np.linalg.norm(dec - dec_q) / np.linalg.norm(dec)
        assert np.isfinite(dec_q).all()
        assert rel < 0.05, rel

    def test_sample_statistics(self, rng):
        vae = AutoencoderKL(ddconfig=TINY_DD, embed_dim=4, scale_factor=0.5)
        mean = jnp.full((1, 4, 4, 4), 2.0)
        logvar = jnp.full((1, 4, 4, 4), -40.0)  # clipped to -30 -> tiny std
        moments = jnp.concatenate([mean, logvar], axis=-1)
        x = jnp.zeros((1, 8, 8, 3))
        params = vae.init(rng, x, rng)
        z = vae.apply(params, moments, rng, method=vae.sample)
        np.testing.assert_allclose(z, 1.0, atol=1e-3)  # 2.0 * 0.5


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
class TestVAEParity:
    def test_encoder_decoder_parity(self):
        import torch

        ref = _ref_modules()
        torch.manual_seed(0)
        enc_t = ref.Encoder(**TINY_DD).eval()
        dec_t = ref.Decoder(**TINY_DD).eval()
        x = np.random.default_rng(0).normal(size=(1, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            h_ref = enc_t(torch.from_numpy(x)).numpy()
        from uspace_tpu.codecs.vae import Encoder as EncF, Decoder as DecF

        enc_f = EncF(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(), resolution=32, z_channels=4)
        enc_params = {"params": vae_torch_to_flax(enc_t.state_dict())}
        h = enc_f.apply(enc_params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(h).transpose(0, 3, 1, 2), h_ref, rtol=1e-4, atol=1e-4
        )

        z = np.random.default_rng(1).normal(size=(1, 4, 16, 16)).astype(np.float32)
        with torch.no_grad():
            d_ref = dec_t(torch.from_numpy(z)).numpy()
        dec_f = DecF(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(), resolution=32, z_channels=4)
        dec_params = {"params": vae_torch_to_flax(dec_t.state_dict())}
        d = dec_f.apply(dec_params, jnp.asarray(z.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(d).transpose(0, 3, 1, 2), d_ref, rtol=1e-4, atol=1e-4
        )

    def test_attn_block_parity(self):
        """The mid AttnBlock (full spatial self-attention) must match."""
        import torch

        ref = _ref_modules()
        torch.manual_seed(1)
        attn_t = ref.AttnBlock(32).eval()
        x = np.random.default_rng(2).normal(size=(2, 32, 8, 8)).astype(np.float32)
        with torch.no_grad():
            y_ref = attn_t(torch.from_numpy(x)).numpy()
        from uspace_tpu.codecs.vae import AttnBlock as AttnF

        params = {"params": vae_torch_to_flax(attn_t.state_dict())}
        y = AttnF().apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 1, 2), y_ref, rtol=1e-4, atol=1e-4
        )


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
class TestUViTParity:
    def _ref_uvit(self, **kw):
        import importlib.util

        if REF not in sys.path:
            sys.path.insert(0, REF)
        import importlib

        libs = importlib.import_module("libs.uvit")
        return libs.UViT(**kw)

    def test_forward_parity_uncond(self):
        import torch

        torch.manual_seed(0)
        kw = dict(img_size=16, patch_size=2, in_chans=4, embed_dim=64,
                  depth=4, num_heads=4, mlp_ratio=4.0, qkv_bias=False,
                  num_classes=-1)
        ref_m = self._ref_uvit(**kw).eval()
        x = np.random.default_rng(0).normal(size=(2, 4, 16, 16)).astype(np.float32)
        t = np.array([0.25, 0.75], np.float32)
        with torch.no_grad():
            v_ref, _ = ref_m(torch.from_numpy(x), torch.from_numpy(t),
                             edit_loc=None)
        from uspace_tpu.models import UViT

        m = UViT(img_size=16, patch_size=2, in_chans=4, embed_dim=64,
                 depth=4, num_heads=4, attn_impl="xla")
        params = {"params": uvit_torch_to_flax(ref_m.state_dict())}
        v, _ = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       jnp.asarray(t))
        np.testing.assert_allclose(
            np.asarray(v).transpose(0, 3, 1, 2), v_ref.numpy(),
            rtol=2e-3, atol=2e-4,
        )

    def test_forward_parity_class_cond(self):
        import torch

        torch.manual_seed(3)
        kw = dict(img_size=16, patch_size=2, in_chans=4, embed_dim=64,
                  depth=4, num_heads=4, num_classes=11)
        ref_m = self._ref_uvit(**kw).eval()
        x = np.random.default_rng(1).normal(size=(2, 4, 16, 16)).astype(np.float32)
        t = np.array([0.5, 0.5], np.float32)
        y = np.array([3, 9])
        with torch.no_grad():
            v_ref, _ = ref_m(torch.from_numpy(x), torch.from_numpy(t),
                             y=torch.from_numpy(y), edit_loc=None)
        from uspace_tpu.models import UViT

        m = UViT(img_size=16, patch_size=2, in_chans=4, embed_dim=64,
                 depth=4, num_heads=4, num_classes=11, attn_impl="xla")
        params = {"params": uvit_torch_to_flax(ref_m.state_dict())}
        v, _ = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       jnp.asarray(t), jnp.asarray(y))
        np.testing.assert_allclose(
            np.asarray(v).transpose(0, 3, 1, 2), v_ref.numpy(),
            rtol=2e-3, atol=2e-4,
        )

    def test_weight_surgery_merge(self):
        """load_nnet_only semantics: drop pos_embed, keep the rest, fall
        back to fresh init for dropped keys (utils_uvit.py:140-155)."""
        import torch

        torch.manual_seed(0)
        ref_m = self._ref_uvit(img_size=16, patch_size=2, in_chans=4,
                               embed_dim=64, depth=4, num_heads=4,
                               num_classes=-1).eval()
        from uspace_tpu.models import UViT

        m = UViT(img_size=16, patch_size=2, in_chans=4, embed_dim=64,
                 depth=4, num_heads=4, attn_impl="xla")
        fresh = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)),
                       jnp.zeros((1,)))["params"]
        conv = uvit_torch_to_flax(ref_m.state_dict(), drop=("pos_embed",))
        assert "pos_embed" not in conv
        merged = merge_params(conv, fresh)
        np.testing.assert_allclose(merged["pos_embed"], fresh["pos_embed"])
        ref_qkv = ref_m.state_dict()["in_blocks.0.attn.qkv.weight"].numpy().T
        np.testing.assert_allclose(
            merged["in_blocks_0"]["attn"]["qkv"]["kernel"], ref_qkv
        )


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
class TestExportRoundTrip:
    def test_uvit_export_reimports_into_reference(self):
        """Train-here -> export -> load into the reference torch model:
        outputs must match (the 'switch back' path)."""
        import torch

        from uspace_tpu.codecs.convert import uvit_flax_to_torch
        from uspace_tpu.models import UViT

        sys.path.insert(0, REF) if REF not in sys.path else None
        import importlib

        libs = importlib.import_module("libs.uvit")
        m = UViT(img_size=16, patch_size=2, in_chans=4, embed_dim=64,
                 depth=4, num_heads=4, attn_impl="xla")
        x = np.random.default_rng(3).normal(size=(2, 4, 16, 16)).astype(np.float32)
        t = np.array([0.2, 0.9], np.float32)
        params = m.init(jax.random.PRNGKey(0),
                        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
        v_ours, _ = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                            jnp.asarray(t))
        sd = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in uvit_flax_to_torch(params).items()}
        ref_m = libs.UViT(img_size=16, patch_size=2, in_chans=4, embed_dim=64,
                          depth=4, num_heads=4, num_classes=-1).eval()
        missing, unexpected = ref_m.load_state_dict(sd, strict=True), None
        with torch.no_grad():
            v_ref, _ = ref_m(torch.from_numpy(x), torch.from_numpy(t),
                             edit_loc=None)
        np.testing.assert_allclose(
            np.asarray(v_ours).transpose(0, 3, 1, 2), v_ref.numpy(),
            rtol=2e-3, atol=2e-4,
        )

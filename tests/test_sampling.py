"""Sampling driver tests: classifier-free guidance composition and
process-sharded sample2dir output."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from uspace_tpu.evals.sampling import cfg_velocity_fn, sample2dir
from uspace_tpu.models import UViTT2I


class TestCFG:
    def test_guidance_composition(self, rng):
        """cfg(v) = v_u + s*(v_c - v_u): s=0 -> uncond; s=1 -> cond."""
        m = UViTT2I(img_size=8, patch_size=2, in_chans=4, embed_dim=32,
                    depth=2, num_heads=4, clip_dim=16, num_clip_token=3,
                    attn_impl="xla")
        x = jax.random.normal(rng, (2, 8, 8, 4))
        t = jnp.full((2,), 0.5)
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, 3, 16))
        null = jnp.zeros_like(ctx)
        params = m.init(rng, x, t, ctx)
        v_c, _ = m.apply(params, x, t, ctx)
        v_u, _ = m.apply(params, x, t, null)
        for s in (0.0, 1.0, 3.0):
            vf = cfg_velocity_fn(m, params, {"context": ctx},
                                 {"context": null}, guidance_scale=s)
            got = vf(t, x)
            want = v_u + s * (v_c - v_u)
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestSample2Dir:
    def test_writes_all_images(self, tmp_path, rng):
        def fake_sample(rng, n):
            return jnp.ones((n, 8, 8, 3)) * 0.5

        out = str(tmp_path / "samples")
        sample2dir(fake_sample, n_samples=10, mini_batch_size=4,
                   out_dir=out, rng=rng)
        files = sorted(os.listdir(out))
        assert len(files) == 10
        assert "0.png" in files and "9.png" in files

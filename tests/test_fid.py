"""FID tests: Fréchet distance closed forms, stats format compat, and the
Inception graph (shape + converter round trip on random weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uspace_tpu.evals.fid import (
    activation_statistics,
    frechet_distance,
)
from uspace_tpu.evals.inception import InceptionV3, inception_torch_to_flax


class TestFrechet:
    def test_identical_is_zero(self, np_rng):
        acts = np_rng.normal(size=(500, 8)).astype(np.float64)
        mu, sigma = activation_statistics(acts)
        assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6

    def test_mean_shift_closed_form(self):
        # equal covariance, mean shift d -> FID = |d|^2
        mu1 = np.zeros(4)
        mu2 = np.array([1.0, 2.0, 0.0, 0.0])
        sigma = np.eye(4)
        np.testing.assert_allclose(
            frechet_distance(mu1, sigma, mu2, sigma), 5.0, rtol=1e-6)

    def test_variance_closed_form(self):
        # N(0, a I) vs N(0, b I) in d dims: FID = d (sqrt(a) - sqrt(b))^2
        d = 3
        a, b = 4.0, 1.0
        got = frechet_distance(np.zeros(d), a * np.eye(d),
                               np.zeros(d), b * np.eye(d))
        np.testing.assert_allclose(got, d * (2.0 - 1.0) ** 2, rtol=1e-6)

    def test_monotone_in_separation(self, np_rng):
        base = np_rng.normal(size=(1000, 6))
        mu0, s0 = activation_statistics(base)
        d_small = frechet_distance(
            mu0, s0, *activation_statistics(base + 0.1))
        d_big = frechet_distance(
            mu0, s0, *activation_statistics(base + 1.0))
        assert 0 < d_small < d_big


@pytest.mark.slow
class TestInceptionGraph:
    def test_pool3_shape(self, rng):
        m = InceptionV3()
        x = jax.random.uniform(rng, (2, 64, 64, 3))
        params = m.init(rng, x)
        out = m.apply(params, x)
        assert out.shape == (2, 2048)
        assert np.isfinite(np.asarray(out)).all()

    def test_converter_structure_matches_init(self, rng):
        """Converted torch-named random weights must slot exactly into the
        flax param tree (same paths, same shapes)."""
        torch = pytest.importorskip("torch")
        m = InceptionV3()
        x = jnp.zeros((1, 32, 32, 3))
        params = m.init(rng, x)["params"]

        # build a fake torch state dict from the flax tree's own shapes
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        sd = {}
        for kp, v in flat:
            keys = [str(getattr(k, "key", k)) for k in kp]
            mod = ".".join(keys[:-1])
            leaf = keys[-1]
            if leaf == "kernel":
                tname, arr = "weight", np.transpose(np.asarray(v), (3, 2, 0, 1))
                sd[f"{mod}.{tname}"] = torch.from_numpy(arr.copy())
            else:
                tname = {"bn_scale": "weight", "bn_bias": "bias",
                         "bn_mean": "running_mean",
                         "bn_var": "running_var"}[leaf]
                base = mod[:-len(".conv")] if mod.endswith(".conv") else mod
                sd[f"{base}.bn.{tname}"] = torch.from_numpy(
                    np.asarray(v).copy())
        conv = inception_torch_to_flax(sd)
        ref_paths = {tuple(str(getattr(k, "key", k)) for k in kp): v.shape
                     for kp, v in flat}
        got_paths = {tuple(str(getattr(k, "key", k)) for k in kp): v.shape
                     for kp, v in
                     jax.tree_util.tree_flatten_with_path(conv)[0]}
        assert ref_paths == got_paths


class TestFidPaths:
    def test_fid_given_npz_paths(self, tmp_path, np_rng):
        from uspace_tpu.evals.fid import fid_given_paths

        a = np_rng.normal(size=(400, 16))
        b = a + 0.5
        for name, acts in (("a.npz", a), ("b.npz", b)):
            mu, sigma = np.mean(acts, 0), np.cov(acts, rowvar=False)
            np.savez(tmp_path / name, mu=mu, sigma=sigma)
        d_same = fid_given_paths(str(tmp_path / "a.npz"), str(tmp_path / "a.npz"))
        d_diff = fid_given_paths(str(tmp_path / "a.npz"), str(tmp_path / "b.npz"))
        assert abs(d_same) < 1e-6
        assert d_diff > 1.0  # 16 * 0.25 = 4 expected
        np.testing.assert_allclose(d_diff, 16 * 0.25, rtol=0.05)

    def test_featurizer_requires_weights(self):
        from uspace_tpu.evals.fid import InceptionFeaturizer

        with pytest.raises(FileNotFoundError, match="pt_inception"):
            InceptionFeaturizer("/nonexistent/weights.pth")

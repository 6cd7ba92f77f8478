"""Fréchet Inception Distance (pytorch-fid-compatible protocol).

Counterpart of `/root/reference/tools/fid_score.py`: InceptionV3-pool3
activations, (mu, sigma) Gaussian stats with ``.npz`` caching in the same
``{mu, sigma}`` key format, and the Fréchet distance with the same sqrtm
stabilization (`fid_score.py:132-186`). Activation extraction runs
batched+jitted on device; sqrtm runs on host via scipy (a one-off
2048x2048 operation).
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .inception import InceptionV3, inception_torch_to_flax

DEFAULT_WEIGHTS = "assets/fid/pt_inception-2015-12-05.pth"


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d^2 = |mu1 - mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))
    (reference calculate_frechet_distance, fid_score.py:132-186,
    including the eps-jitter retry and imaginary-part check)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def activation_statistics(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(acts, axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


class InceptionFeaturizer:
    """Jitted pool3 activation extractor."""

    def __init__(self, weights_path: Optional[str] = None):
        self.model = InceptionV3()
        path = weights_path or DEFAULT_WEIGHTS
        if path == "random":
            # plumbing-proof mode: a random-init featurizer so the full
            # sample->decode->featurize->Frechet->best-ckpt pipeline can
            # execute end-to-end in environments without the pytorch-fid
            # asset (the FID value is meaningless; the plumbing is not)
            self.params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3), jnp.float32))
        elif not os.path.exists(path):
            raise FileNotFoundError(
                f"Inception weights not found at {path}; download "
                "pt_inception-2015-12-05 (pytorch-fid) and point "
                "weights_path at it."
            )
        else:
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            self.params = {"params": inception_torch_to_flax(sd)}
        # params as an explicit jit argument (closure capture bakes the
        # tree into the executable payload)
        _fwd = jax.jit(lambda p, imgs: self.model.apply(p, imgs))
        self._fn = lambda imgs: _fwd(self.params, imgs)

    def __call__(self, images01, batch_size: int = 50) -> np.ndarray:
        """images01: [N, H, W, 3] float in [0, 1] (array or lazy per-image
        iterable of [H, W, 3]) -> [N, 2048]."""
        outs = []
        batch = []
        for img in images01:
            batch.append(np.asarray(img, np.float32))
            if len(batch) == batch_size:
                outs.append(np.asarray(self._fn(jnp.asarray(np.stack(batch)))))
                batch = []
        if batch:
            outs.append(np.asarray(self._fn(jnp.asarray(np.stack(batch)))))
        return np.concatenate(outs)


def _iter_images_from_dir(path: str):
    """Lazy per-image loader — a 50k-image FID eval must not hold
    ~39 GB of pixels in host RAM at once."""
    from PIL import Image

    exts = (".png", ".jpg", ".jpeg", ".bmp")
    files = sorted(f for f in os.listdir(path) if f.lower().endswith(exts))
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    for f in files:
        yield np.asarray(Image.open(os.path.join(path, f)).convert("RGB"),
                         np.float32) / 255.0


def compute_statistics_of_path(
    path: str, featurizer: Optional[InceptionFeaturizer] = None,
    batch_size: int = 50,
) -> Tuple[np.ndarray, np.ndarray]:
    """.npz stats file (mu/sigma keys, pytorch-fid format) or an image
    directory (reference fid_score.py:214-225)."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            return f["mu"][:], f["sigma"][:]
    feat = featurizer or InceptionFeaturizer()
    acts = feat(_iter_images_from_dir(path), batch_size)
    return activation_statistics(acts)


def save_statistics_of_path(path: str, out_npz: str,
                            featurizer=None, batch_size: int = 50) -> None:
    """Precompute dataset stats (reference save_statistics_of_path,
    fid_score.py:228-236)."""
    mu, sigma = compute_statistics_of_path(path, featurizer, batch_size)
    np.savez(out_npz, mu=mu, sigma=sigma)


def fid_given_paths(path1: str, path2: str,
                    weights_path: Optional[str] = None,
                    batch_size: int = 50) -> float:
    """FID between two paths (stats .npz or image dirs) — reference
    calculate_fid_given_paths (fid_score.py:239-260)."""
    feat = None
    if not (path1.endswith(".npz") and path2.endswith(".npz")):
        feat = InceptionFeaturizer(weights_path)
    m1, s1 = compute_statistics_of_path(path1, feat, batch_size)
    m2, s2 = compute_statistics_of_path(path2, feat, batch_size)
    return frechet_distance(m1, s1, m2, s2)

"""Offline feature extraction: raw images -> VAE moments (+CLIP contexts).

TPU-batched replacement for the reference's 16 per-dataset GPU scripts
(`/root/reference/scripts/`): one jitted VAE ``encode_moments`` pass over
device-sized batches, writing the same on-disk formats the feature
datasets read back:

- per-index ``{i}.npy`` pickled tuples ``(moments, label)`` /
  ``(moments, segmask, attr)`` (extract_celebamask_feature*.py:48-64),
- T2I dirs: ``{i}.npy`` moments + ``{i}_{k}.npy`` CLIP contexts +
  ``{i}_{k}_captions.txt`` (extract_mscoco_feature.py:50-64),
- bulk h5 ``train_feat``/``train_attr`` (h5_extract_*.py),
- ``empty_context.npy`` for CFG (extract_empty_feature.py:17-30),
- ``run_vis/{i}.npy`` pickled (prompt, context) eval prompts
  (extract_test_prompt_feature.py).

Moments are stored CHW to stay byte-compatible with reference-produced
datasets (the loaders transpose to NHWC).
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from .datasets import Dataset


def _to_chw(moments_nhwc: np.ndarray) -> np.ndarray:
    return np.transpose(moments_nhwc, (0, 3, 1, 2))


def make_vae_encoder(vae_params, scale_factor: float = 0.18215) -> Callable:
    """Jitted images[-1,1] NHWC -> posterior moments NHWC."""
    from ..codecs.vae import AutoencoderKL

    vae = AutoencoderKL(scale_factor=scale_factor)

    @jax.jit
    def encode_moments(images):
        return vae.apply(vae_params, images, method=vae.encode_moments)

    return encode_moments


def _batched(dataset: Dataset, batch_size: int):
    n = len(dataset)
    for start in range(0, n, batch_size):
        idx = range(start, min(start + batch_size, n))
        yield start, [dataset[i] for i in idx]


def extract_features_npy(
    dataset: Dataset,
    encode_moments: Callable,
    out_dir: str,
    batch_size: int = 64,
    flip: bool = False,
) -> int:
    """Per-index npy extraction. Writes ``{i}.npy`` as (moments, label)
    or (moments, segmask, attr) when the sample carries attrs.
    ``flip=True`` doubles the dataset with horizontal flips at indices
    n+i (the reference's flip-augmented ImageNet extraction)."""
    os.makedirs(out_dir, exist_ok=True)
    n = len(dataset)
    count = 0
    for start, samples in _batched(dataset, batch_size):
        imgs = np.stack([s["image"] for s in samples])
        variants = [(0, imgs)]
        if flip:
            variants.append((n, imgs[:, :, ::-1]))
        for offset, batch in variants:
            moments = _to_chw(np.asarray(encode_moments(jnp.asarray(batch))))
            for j, s in enumerate(samples):
                i = offset + start + j
                if "attr" in s:
                    seg = s.get("segmask", np.zeros((1,), np.uint8))
                    obj = np.array((moments[j], seg, np.asarray(s["attr"])),
                                   dtype=object)
                else:
                    obj = np.array((moments[j], np.int64(s.get("y", 0))),
                                   dtype=object)
                np.save(os.path.join(out_dir, f"{i}.npy"), obj,
                        allow_pickle=True)
                count += 1
    logging.info("extracted %d feature files -> %s", count, out_dir)
    return count


def extract_features_h5(
    dataset: Dataset,
    encode_moments: Callable,
    out_path: str,
    batch_size: int = 64,
) -> int:
    """Bulk h5 extraction: train_feat [N, 2C, h, w] (+train_attr)."""
    import h5py

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    feats, attrs = [], []
    for _start, samples in _batched(dataset, batch_size):
        imgs = np.stack([s["image"] for s in samples])
        feats.append(_to_chw(np.asarray(encode_moments(jnp.asarray(imgs)))))
        if "attr" in samples[0]:
            attrs.append(np.stack([s["attr"] for s in samples]))
    feats = np.concatenate(feats)
    with h5py.File(out_path, "w") as f:
        f["train_feat"] = feats
        if attrs:
            f["train_attr"] = np.concatenate(attrs)
    logging.info("extracted %d features -> %s", len(feats), out_path)
    return len(feats)


def extract_t2i_features(
    dataset: Dataset,
    encode_moments: Callable,
    encode_text: Callable[[Sequence[str]], np.ndarray],
    out_dir: str,
    batch_size: int = 32,
) -> int:
    """MSCOCO/MM-CelebA-HQ format: moments + per-caption contexts +
    captions txt (reference extract_mscoco_feature.py:50-64,
    extract_mmcelebahq_feature_with_caption_context.py:39-57)."""
    os.makedirs(out_dir, exist_ok=True)
    count = 0
    for start, samples in _batched(dataset, batch_size):
        imgs = np.stack([s["image"] for s in samples])
        moments = _to_chw(np.asarray(encode_moments(jnp.asarray(imgs))))
        for j, s in enumerate(samples):
            i = start + j
            np.save(os.path.join(out_dir, f"{i}.npy"), moments[j])
            caps = s.get("captions") or [""]
            ctxs = np.asarray(encode_text(caps))
            for k, (cap, ctx) in enumerate(zip(caps, ctxs)):
                np.save(os.path.join(out_dir, f"{i}_{k}.npy"), ctx)
                with open(os.path.join(out_dir, f"{i}_{k}_captions.txt"),
                          "w") as f:
                    f.write("\n".join(caps) + "\n")
            count += 1
    logging.info("extracted %d t2i feature sets -> %s", count, out_dir)
    return count


def extract_empty_context(encode_text: Callable, out_dir: str) -> str:
    """CFG null context: CLIP("") (extract_empty_feature.py:17-30)."""
    os.makedirs(out_dir, exist_ok=True)
    ctx = np.asarray(encode_text([""]))[0]
    path = os.path.join(out_dir, "empty_context.npy")
    np.save(path, ctx)
    return path


def extract_test_prompts(
    prompts: Sequence[str], encode_text: Callable, out_dir: str
) -> str:
    """Fixed eval prompts -> run_vis/{i}.npy pickled (prompt, context)
    (extract_test_prompt_feature.py)."""
    run_vis = os.path.join(out_dir, "run_vis")
    os.makedirs(run_vis, exist_ok=True)
    ctxs = np.asarray(encode_text(list(prompts)))
    for i, (p, c) in enumerate(zip(prompts, ctxs)):
        np.save(os.path.join(run_vis, f"{i}.npy"),
                np.array((p, c), dtype=object), allow_pickle=True)
    return run_vis

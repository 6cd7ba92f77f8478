"""Feature/raw dataset registry (TPU-native data layer).

Counterpart of `/root/reference/datasets.py` (factory + registry,
:63-107, :1113-1158). Same on-disk formats — per-index ``{i}.npy`` VAE
moments (optionally pickled tuples with segmask/attr/label), MSCOCO-style
``{i}.npy`` + ``{i}_{k}.npy`` CLIP contexts, bulk h5 — but returning NHWC
numpy dicts ready for device sharding, and with a working CFG wrapper
(the reference's raises NotImplementedError, `datasets.py:46-60`).

Samples are dicts: ``x`` (moments or latents, NHWC), optional ``y``
(int label), ``attr`` (attribute vector), ``context`` ([77, 768] CLIP),
``caption`` (str).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np


class _EpochRng:
    """Deterministic per-(epoch, index) RNG for host-side data
    augmentation (caption draws, CFG drops). Seeded by (seed, idx,
    epoch) so draws vary across epochs yet are bit-reproducible
    regardless of loader thread interleaving or visit order — the
    loader announces the epoch via ``Dataset.set_epoch`` before
    producing (fixes the round-1 access-counter race)."""

    def __init__(self, seed: int, stream: int = 0):
        # ``stream`` separates rng users that wrap each other (e.g.
        # CFGDataset around CaptionFeatureDataset): without it both draw
        # the FIRST sample from identically seeded generators, coupling
        # the CFG drop to the caption index
        self.seed = seed
        self.stream = stream
        self.epoch = 0

    def for_index(self, idx: int) -> np.random.Generator:
        return np.random.default_rng((self.seed, self.stream, idx,
                                      self.epoch))

Array = np.ndarray


def _chw_to_hwc(z: Array) -> Array:
    if z.ndim == 3:
        return np.transpose(z, (1, 2, 0))
    return z


class Dataset:
    """Minimal map-style protocol: __len__ + __getitem__ -> dict."""

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        raise NotImplementedError

    def set_epoch(self, epoch: int) -> None:
        """Announce the epoch for per-epoch deterministic augmentation;
        called by the loader before producing. No-op by default."""


class NpyFeatureDataset(Dataset):
    """Directory of per-index ``{i}.npy`` feature files.

    fmt:
      - "plain":  file is the moments array (MSCOCO image files)
      - "pair":   pickled (z, z) tuple (CommonFeatureDataset,
                  reference datasets.py:502-514)
      - "cond":   pickled (z, segmask, attr) (CM conditional, :517-532)
      - "labeled": pickled (z, label) (ImageNet FeatureDataset, :173-191)
    """

    def __init__(self, path: str, num: Optional[int] = None,
                 fmt: str = "pair"):
        self.path = path
        self.fmt = fmt
        if num is None:
            num = len([f for f in os.listdir(path)
                       if f.endswith(".npy") and "_" not in f])
        self.num = num

    def __len__(self):
        return self.num

    def __getitem__(self, idx):
        f = os.path.join(self.path, f"{idx}.npy")
        if self.fmt == "plain":
            z = np.load(f)
            return {"x": _chw_to_hwc(z)}
        obj = np.load(f, allow_pickle=True)
        if self.fmt == "pair":
            z = np.asarray(obj[0], dtype=np.float32)
            return {"x": _chw_to_hwc(z)}
        if self.fmt == "cond":
            z, _segmask, attr = obj
            return {"x": _chw_to_hwc(z), "attr": np.asarray(attr)}
        if self.fmt == "labeled":
            z, label = obj
            return {"x": _chw_to_hwc(z), "y": np.int32(label)}
        raise ValueError(self.fmt)


class H5FeatureDataset(Dataset):
    """Bulk h5 features: ``train_feat`` plus optional ``train_label`` /
    ``train_attr`` (reference datasets.py:416-499)."""

    def __init__(self, path: str, load_in_mem: bool = True,
                 num: Optional[int] = None):
        import h5py

        self._f = h5py.File(path, "r")
        self.feat = self._f["train_feat"]
        self.label = self._f.get("train_label")
        self.attr = self._f.get("train_attr")
        if load_in_mem:
            self.feat = self.feat[:]
            self.label = self.label[:] if self.label is not None else None
            self.attr = self.attr[:] if self.attr is not None else None
        self.num = num or len(self.feat)

    def __len__(self):
        return self.num

    def __getitem__(self, idx):
        out = {"x": _chw_to_hwc(np.copy(self.feat[idx]))}
        if self.label is not None:
            out["y"] = np.int32(np.asarray(self.label[idx]).item())
        if self.attr is not None:
            out["attr"] = np.copy(self.attr[idx])
        return out


def get_feature_dir_info(root: str) -> Tuple[int, Dict[int, int]]:
    """Count images and per-image caption files in an MSCOCO-style feature
    dir (reference datasets.py:950-960)."""
    files = os.listdir(root)
    num_data = 0
    n_captions: Dict[int, int] = {}
    for name in files:
        stem, ext = os.path.splitext(name)
        if ext != ".npy":
            continue
        parts = stem.split("_")
        if len(parts) == 1 and parts[0].isdigit():
            num_data += 1
        elif len(parts) == 2 and parts[0].isdigit() and parts[1].isdigit():
            k = int(parts[0])
            n_captions[k] = n_captions.get(k, 0) + 1
    return num_data, n_captions


class CaptionFeatureDataset(Dataset):
    """MSCOCO/MM-CelebA-HQ style: ``{i}.npy`` moments + ``{i}_{k}.npy``
    CLIP contexts (+ ``{i}_{k}_captions.txt``) — reference
    datasets.py:963-987. A random caption is drawn per access via the
    loader-provided rng (host-side data augmentation)."""

    def __init__(self, root: str, output_caption: bool = False,
                 seed: int = 0):
        self.root = root
        self.output_caption = output_caption
        self.num_data, self.n_captions = get_feature_dir_info(root)
        self._rng = _EpochRng(seed)

    def set_epoch(self, epoch: int) -> None:
        self._rng.epoch = epoch

    def __len__(self):
        return self.num_data

    def __getitem__(self, idx):
        z = np.load(os.path.join(self.root, f"{idx}.npy"))
        k = int(self._rng.for_index(idx).integers(0, self.n_captions[idx]))
        c = np.load(os.path.join(self.root, f"{idx}_{k}.npy"))
        out = {"x": _chw_to_hwc(z), "context": c}
        if self.output_caption:
            with open(os.path.join(self.root, f"{idx}_{k}_captions.txt")) as f:
                caps = [l.strip() for l in f.readlines() if l.strip()]
            out["caption"] = (caps[k] if k < len(caps)
                              else (caps[0] if caps else ""))
        return out


class CFGDataset(Dataset):
    """Classifier-free-guidance wrapper: with prob ``p_uncond`` replace
    the conditioning with the null value (empty CLIP context, or class K
    as the learned null label). The reference's version raises
    NotImplementedError (`datasets.py:46-60`); this one works."""

    def __init__(self, dataset: Dataset, p_uncond: float, empty_context=None,
                 null_label: Optional[int] = None, seed: int = 0):
        self.dataset = dataset
        self.p_uncond = p_uncond
        self.empty_context = empty_context
        self.null_label = null_label
        self._rng = _EpochRng(seed, stream=1)

    def set_epoch(self, epoch: int) -> None:
        self._rng.epoch = epoch
        self.dataset.set_epoch(epoch)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        out = dict(self.dataset[idx])
        if self._rng.for_index(idx).random() < self.p_uncond:
            if "context" in out and self.empty_context is not None:
                out["context"] = np.asarray(self.empty_context)
            if "y" in out and self.null_label is not None:
                out["y"] = np.int32(self.null_label)
        return out


class SyntheticFeatures(Dataset):
    """Random moments dataset for tests/benchmarks (no reference analog —
    the reference has no test suite)."""

    def __init__(self, num: int = 256, shape=(32, 32, 8), num_classes: int = 0,
                 context_shape=None, seed: int = 0):
        self.num = num
        self.shape = shape
        self.num_classes = num_classes
        self.context_shape = context_shape
        self.seed = seed

    def __len__(self):
        return self.num

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed + idx)
        out = {"x": rng.normal(size=self.shape).astype(np.float32)}
        if self.num_classes:
            out["y"] = np.int32(rng.integers(0, self.num_classes))
        if self.context_shape:
            out["context"] = rng.normal(size=self.context_shape).astype(
                np.float32)
        return out


class SyntheticAttrFeatures(Dataset):
    """Attribute-structured synthetic moments for the end-to-end editing
    proof (no reference analog — stands in for CelebA/FFHQ latents+attrs
    so the full read→directions→write workflow is verifiable without the
    VAE assets). Each sample's latent is

        x = base_std * g(idx)  +  Σ_a  attr_a(idx) * amp * P_a

    with g per-index Gaussian noise and ``P_a`` fixed orthonormal
    patterns (``patterns()``), stored as VAE-style moments (mean‖logvar,
    pre-divided by the SD scale factor so ``sample_from_moments``
    reproduces x + small noise). A trained flow model then genuinely
    carries the attributes, and a u-space attr-direction edit must move
    the generated latents' projection onto ``P_a`` — the quantitative
    proxy used by docs/editing_e2e.md and tests.
    """

    SCALE = 0.18215  # must match config.autoencoder.scale_factor

    def __init__(self, num: int = 4096, shape=(8, 8, 8), num_attrs: int = 4,
                 base_std: float = 0.4, amp: float = 1.5,
                 noise_std: float = 0.05, raw: bool = False, seed: int = 0):
        # raw=True: emit the latent itself instead of VAE-style moments —
        # the pixel-space (train_ffmm, from_moments=False) data path
        assert shape[-1] % 2 == 0, "moments shape needs mean‖logvar channels"
        self.num = num
        self.raw = raw
        self.shape = tuple(shape)
        self.latent_shape = (*self.shape[:-1], self.shape[-1] // 2)
        self.num_attrs = num_attrs
        self.base_std = base_std
        self.amp = amp
        self.noise_std = noise_std
        self.seed = seed
        self._pat = self.patterns(self.latent_shape, num_attrs)

    @staticmethod
    def patterns(latent_shape, num_attrs: int) -> np.ndarray:
        """[A, *latent_shape] fixed orthonormal directions (unit L2)."""
        dim = int(np.prod(latent_shape))
        rng = np.random.default_rng(12345)
        q, _ = np.linalg.qr(rng.normal(size=(dim, num_attrs)))
        return q.T.reshape(num_attrs, *latent_shape).astype(np.float32)

    def attr_of(self, idx: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, 1, idx))
        return (rng.random(self.num_attrs) < 0.5).astype(np.float32)

    def latent_of(self, idx: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, 0, idx))
        g = rng.normal(size=self.latent_shape).astype(np.float32)
        attr = self.attr_of(idx)
        return self.base_std * g + self.amp * np.tensordot(
            attr, self._pat, axes=1)

    def __len__(self):
        return self.num

    def __getitem__(self, idx):
        if self.raw:
            return {"x": self.latent_of(idx), "attr": self.attr_of(idx)}
        mean = self.latent_of(idx) / self.SCALE
        logvar = np.full_like(mean, 2.0 * np.log(self.noise_std / self.SCALE))
        return {"x": np.concatenate([mean, logvar], axis=-1),
                "attr": self.attr_of(idx)}


class SyntheticT2IFeatures(Dataset):
    """Caption-structured synthetic moments for the T2I end-to-end proof
    (no reference analog — stands in for MSCOCO/MM-CelebA latents+CLIP
    contexts). Each sample's "caption" is two distinct words from a
    V-word vocabulary; the latent carries that pair of orthonormal
    patterns and the context carries the words' embeddings:

        latent  = base_std * g(idx) + amp * (P_{w1} + P_{w2})
        context = [0-row, E[w1], E[w2], 0-rows...]   ([T, ctx_dim])

    with fixed orthonormal ``P_a = patterns(...)`` (shared with
    :class:`SyntheticAttrFeatures`) and fixed orthonormal word
    embeddings ``E = word_embeddings(...)``. A trained T2I flow model
    must then genuinely condition on the context — making
    prompt-to-prompt column rescales and local-prompt rewrites
    quantitatively verifiable (docs + tests).
    """

    SCALE = 0.18215

    def __init__(self, num: int = 4096, shape=(8, 8, 8), vocab: int = 6,
                 num_tokens: int = 8, ctx_dim: int = 32,
                 base_std: float = 0.35, amp: float = 3.0,
                 noise_std: float = 0.05, ctx_scale: float = 4.0,
                 seed: int = 0):
        # amp 3.0 / base_std 0.35: the conditional-vs-unconditional loss
        # gap is ~2*amp^2/dim of the total MSE — at amp 1.5 that is ~3%
        # and a small model simply ignores the context (measured: 4.7%
        # output sensitivity after 4k steps); at 3.0 it is ~11% and
        # conditioning emerges. ctx_scale amplifies the unit-norm word
        # embeddings so the context tokens are not dwarfed by the patch
        # tokens at init.
        assert shape[-1] % 2 == 0
        self.num = num
        self.shape = tuple(shape)
        self.latent_shape = (*self.shape[:-1], self.shape[-1] // 2)
        self.vocab = vocab
        self.num_tokens = num_tokens
        self.ctx_dim = ctx_dim
        self.base_std = base_std
        self.amp = amp
        self.noise_std = noise_std
        self.ctx_scale = ctx_scale
        self.seed = seed
        self._pat = SyntheticAttrFeatures.patterns(self.latent_shape, vocab)
        self._emb = self.word_embeddings(ctx_dim, vocab)

    @staticmethod
    def word_embeddings(ctx_dim: int, vocab: int) -> np.ndarray:
        """[V, ctx_dim] fixed orthonormal word embeddings."""
        rng = np.random.default_rng(54321)
        q, _ = np.linalg.qr(rng.normal(size=(ctx_dim, vocab)))
        return np.ascontiguousarray(q.T, dtype=np.float32)

    def words_of(self, idx: int) -> Tuple[int, int]:
        rng = np.random.default_rng((self.seed, 1, idx))
        w1, w2 = rng.choice(self.vocab, size=2, replace=False)
        return int(w1), int(w2)

    def context_of(self, w1: int, w2: int) -> np.ndarray:
        """Word positions are context rows 1 and 2 (row 0 left empty as a
        BOS stand-in, matching the CLIP layout where editing targets
        interior word tokens)."""
        ctx = np.zeros((self.num_tokens, self.ctx_dim), np.float32)
        ctx[1] = self.ctx_scale * self._emb[w1]
        ctx[2] = self.ctx_scale * self._emb[w2]
        return ctx

    def latent_of(self, idx: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, 0, idx))
        g = rng.normal(size=self.latent_shape).astype(np.float32)
        w1, w2 = self.words_of(idx)
        return (self.base_std * g
                + self.amp * (self._pat[w1] + self._pat[w2]))

    def __len__(self):
        return self.num

    def __getitem__(self, idx):
        mean = self.latent_of(idx) / self.SCALE
        logvar = np.full_like(mean, 2.0 * np.log(self.noise_std / self.SCALE))
        w1, w2 = self.words_of(idx)
        return {"x": np.concatenate([mean, logvar], axis=-1),
                "context": self.context_of(w1, w2),
                "words": np.asarray([w1, w2], np.int32)}


class SyntheticClassFeatures(Dataset):
    """Class-structured synthetic moments for the class-conditional
    end-to-end proof (stands in for ImageNet latents+labels): the latent
    carries the class's orthonormal pattern,

        x = base_std * g(idx) + amp * P_{y(idx)},

    stored as VAE-style moments (see SyntheticAttrFeatures for the
    moments/scale convention)."""

    SCALE = 0.18215

    def __init__(self, num: int = 4096, shape=(4, 4, 8), num_classes: int = 6,
                 base_std: float = 0.35, amp: float = 5.0,
                 noise_std: float = 0.05, seed: int = 0):
        assert shape[-1] % 2 == 0
        self.num = num
        self.shape = tuple(shape)
        self.latent_shape = (*self.shape[:-1], self.shape[-1] // 2)
        self.num_classes = num_classes
        self.base_std = base_std
        self.amp = amp
        self.noise_std = noise_std
        self.seed = seed
        self._pat = SyntheticAttrFeatures.patterns(self.latent_shape,
                                                   num_classes)

    def label_of(self, idx: int) -> int:
        rng = np.random.default_rng((self.seed, 1, idx))
        return int(rng.integers(0, self.num_classes))

    def latent_of(self, idx: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, 0, idx))
        g = rng.normal(size=self.latent_shape).astype(np.float32)
        return self.base_std * g + self.amp * self._pat[self.label_of(idx)]

    def __len__(self):
        return self.num

    def __getitem__(self, idx):
        mean = self.latent_of(idx) / self.SCALE
        logvar = np.full_like(mean, 2.0 * np.log(self.noise_std / self.SCALE))
        return {"x": np.concatenate([mean, logvar], axis=-1),
                "y": np.int32(self.label_of(idx))}


# ---------------------------------------------------------------------------
# Factories (reference DatasetFactory surface, datasets.py:63-107)
# ---------------------------------------------------------------------------


class DatasetFactory:
    """data_shape is NHWC. ``train``/``test`` are Dataset instances."""

    train: Dataset = None
    test: Optional[Dataset] = None
    fid_stat: Optional[str] = None
    has_label: bool = False
    K: Optional[int] = None  # number of classes

    @property
    def data_shape(self):
        return (32, 32, 4)

    def get_split(self, split: str = "train"):
        ds = getattr(self, split, None)
        if ds is None:
            raise ValueError(f"dataset has no split {split!r}")
        return ds

    def sample_label(self, rng, n_samples: int):
        import jax

        if not self.K:
            raise NotImplementedError("unconditional dataset")
        return jax.random.randint(rng, (n_samples,), 0, self.K)

    @staticmethod
    def unpreprocess(images: Array) -> Array:
        """[-1, 1] -> [0, 1] (reference datasets.py:84-90)."""
        return np.clip((images + 1.0) / 2.0, 0.0, 1.0)


class CM256Features(DatasetFactory):
    """CelebAMask-HQ 30k latents (reference datasets.py:556-586)."""

    fid_stat = "assets/fid_stats/fid_stats_cm256.npz"

    def __init__(self, path, cfg=False, p_uncond=None, num=30_000,
                 conditional=False):
        if cfg:
            raise NotImplementedError(
                "CFG dropout is not defined for this dataset (no null "
                "conditioning); the cfg flag would be silently ignored")
        fmt = "cond" if conditional else "pair"
        self.train = NpyFeatureDataset(path, num=num, fmt=fmt)


class CM256FeaturesCond(CM256Features):
    def __init__(self, path, cfg=False, p_uncond=None, num=30_000):
        super().__init__(path, num=num, conditional=True)


class H5Features(DatasetFactory):
    """FFHQ/MetFaces/AFHQ/Churches bulk-h5 latents (+optional attrs)
    (reference datasets.py:589-718)."""

    def __init__(self, path, cfg=False, p_uncond=None, num=None,
                 load_in_mem=True, fid_stat=None):
        if cfg:
            raise NotImplementedError(
                "CFG dropout is not defined for this dataset (no null "
                "conditioning); the cfg flag would be silently ignored")
        self.train = H5FeatureDataset(path, load_in_mem=load_in_mem, num=num)
        if fid_stat:
            self.fid_stat = fid_stat


class ImageNet256Features(DatasetFactory):
    fid_stat = "assets/fid_stats/fid_stats_imagenet256_guided_diffusion.npz"
    has_label = True

    def __init__(self, path, cfg=False, p_uncond=None, num=1_281_167):
        self.K = 1000  # eval sampling draws real classes only
        self.null_label = None
        train = NpyFeatureDataset(path, num=num, fmt="labeled")
        if cfg:
            assert p_uncond is not None
            # class K is the learned null label (model needs
            # num_classes=K+1); sample_label still draws 0..K-1
            self.null_label = self.K
            train = CFGDataset(train, p_uncond, null_label=self.null_label)
        self.train = train


class ImageNet512Features(ImageNet256Features):
    fid_stat = "assets/fid_stats/fid_stats_imagenet512_guided_diffusion.npz"

    @property
    def data_shape(self):
        return (64, 64, 4)


class MSCOCO256Features(DatasetFactory):
    """MSCOCO latents + CLIP contexts (reference datasets.py:990-1043)."""

    fid_stat = "assets/fid_stats/fid_stats_mscoco256_val.npz"

    def __init__(self, path, cfg=False, p_uncond=None, output_caption=False,
                 expected_sizes=(82783, 40504)):
        self.train = CaptionFeatureDataset(
            os.path.join(path, "train"), output_caption=output_caption)
        self.test = CaptionFeatureDataset(
            os.path.join(path, "val"), output_caption=output_caption)
        if expected_sizes:
            for ds, want in zip((self.train, self.test), expected_sizes):
                if want and len(ds) != want:
                    raise ValueError(f"{ds.root}: {len(ds)} != {want}")
        empty_f = os.path.join(path, "empty_context.npy")
        self.empty_context = (
            np.load(empty_f) if os.path.exists(empty_f) else None
        )
        if cfg:
            assert p_uncond is not None and self.empty_context is not None
            self.train = CFGDataset(self.train, p_uncond,
                                    empty_context=self.empty_context)
        # fixed eval prompts (run_vis/{i}.npy: pickled (prompt, context))
        self.prompts, self.contexts = [], []
        run_vis = os.path.join(path, "run_vis")
        if os.path.isdir(run_vis):
            for f in sorted(os.listdir(run_vis),
                            key=lambda x: int(x.split(".")[0])):
                prompt, context = np.load(os.path.join(run_vis, f),
                                          allow_pickle=True)
                self.prompts.append(prompt)
                self.contexts.append(context)
            self.contexts = np.array(self.contexts)


class MMCelebAHQ256Features(MSCOCO256Features):
    """MM-CelebA-HQ captioned latents (reference datasets.py:1046-1110)."""

    fid_stat = "assets/fid_stats/fid_stats_mmcelebahq256.npz"

    def __init__(self, path, cfg=False, p_uncond=None, output_caption=False):
        super().__init__(path, cfg=cfg, p_uncond=p_uncond,
                         output_caption=output_caption, expected_sizes=None)


class Synthetic(DatasetFactory):
    def __init__(self, num=256, shape=(32, 32, 8), num_classes=0,
                 context_shape=None, fid_stat=None, **_):
        self.train = SyntheticFeatures(num, shape, num_classes, context_shape)
        self.test = SyntheticFeatures(max(num // 4, 1), shape, num_classes,
                                      context_shape, seed=10_000)
        if num_classes:
            self.K = num_classes
            self.has_label = True
        if fid_stat:  # lets integration tests exercise the in-loop FID path
            self.fid_stat = fid_stat

    @property
    def data_shape(self):
        return tuple(self.shape_latent())

    def shape_latent(self):
        h, w, c2 = self.train.shape
        return (h, w, c2 // 2)


class SyntheticAttr(DatasetFactory):
    """Attribute-structured synthetic latents (see SyntheticAttrFeatures)."""

    def __init__(self, num=4096, shape=(8, 8, 8), num_attrs=4,
                 base_std=0.4, amp=1.5, noise_std=0.05, raw=False, **_):
        self.train = SyntheticAttrFeatures(num, shape, num_attrs, base_std,
                                           amp, noise_std, raw)
        self.test = SyntheticAttrFeatures(max(num // 8, 1), shape, num_attrs,
                                          base_std, amp, noise_std, raw,
                                          seed=10_000)

    @property
    def data_shape(self):
        return self.train.latent_shape


class SyntheticT2I(DatasetFactory):
    """Caption-structured synthetic latents (see SyntheticT2IFeatures)."""

    def __init__(self, num=4096, shape=(8, 8, 8), vocab=6, num_tokens=8,
                 ctx_dim=32, base_std=0.35, amp=3.0, noise_std=0.05,
                 ctx_scale=4.0, cfg=False, p_uncond=None, **_):
        self.train = SyntheticT2IFeatures(num, shape, vocab, num_tokens,
                                          ctx_dim, base_std, amp, noise_std,
                                          ctx_scale)
        self.test = SyntheticT2IFeatures(max(num // 8, 1), shape, vocab,
                                         num_tokens, ctx_dim, base_std, amp,
                                         noise_std, ctx_scale, seed=10_000)
        # null conditioning for CFG (the loop broadcasts this)
        self.empty_context = np.zeros((num_tokens, ctx_dim), np.float32)
        if cfg:  # uncond-context dropout for classifier-free guidance
            assert p_uncond is not None
            self.train = CFGDataset(self.train, p_uncond,
                                    empty_context=self.empty_context)

    @property
    def data_shape(self):
        return self.train.latent_shape


class SyntheticClass(DatasetFactory):
    """Class-structured synthetic latents (see SyntheticClassFeatures).
    CFG follows the ImageNet convention: labels 0..K-1 are real, class K
    is the learned null (model needs num_classes=K+1)."""

    has_label = True

    def __init__(self, num=4096, shape=(4, 4, 8), num_classes=6,
                 base_std=0.35, amp=5.0, noise_std=0.05, cfg=False,
                 p_uncond=None, **_):
        self.K = num_classes
        self.null_label = None
        self.train = SyntheticClassFeatures(num, shape, num_classes,
                                            base_std, amp, noise_std)
        self.test = SyntheticClassFeatures(max(num // 8, 1), shape,
                                           num_classes, base_std, amp,
                                           noise_std, seed=10_000)
        if cfg:
            assert p_uncond is not None
            self.null_label = self.K
            self.train = CFGDataset(self.train, p_uncond,
                                    null_label=self.null_label)

    @property
    def data_shape(self):
        return self.test.latent_shape


class RawImages(DatasetFactory):
    """Raw image folders (reference real_img / ffhq256 / celeba entries;
    lfm_dataset adapters). Mostly used by extraction, but exposed through
    the registry for pixel-space (ffmm) training."""

    def __init__(self, path, resolution=256, attr_file=None,
                 mapping_file=None, **_):
        from .raw import CelebAMaskHQ, ImageFolder

        if attr_file:
            self.train = _ImagesAsX(CelebAMaskHQ(path, resolution, attr_file,
                                                 mapping_file=mapping_file))
        else:
            self.train = _ImagesAsX(ImageFolder(path, resolution))
        self.resolution = resolution

    @property
    def data_shape(self):
        return (self.resolution, self.resolution, 3)


class _ImagesAsX(Dataset):
    def __init__(self, base):
        self.base = base

    def set_epoch(self, epoch: int) -> None:
        set_fn = getattr(self.base, "set_epoch", None)
        if set_fn is not None:
            set_fn(epoch)

    def __len__(self):
        return len(self.base)

    def __getitem__(self, idx):
        s = dict(self.base[idx])
        s["x"] = s.pop("image")
        s.pop("path", None)
        return s


_REGISTRY = {
    "celebamask256_features": CM256Features,
    "celebamask256_features_cond": CM256FeaturesCond,
    "ffhq256_features": H5Features,
    "metfaces256_features": H5Features,
    "AFHQ256_cat_features": H5Features,
    "AFHQ256_dog_features": H5Features,
    "churches256_features": H5Features,
    "imagenet256_features": ImageNet256Features,
    "imagenet512_features": ImageNet512Features,
    "mscoco256_features": MSCOCO256Features,
    "mmcelebahq256_features_withcaptioncontext": MMCelebAHQ256Features,
    "synthetic": Synthetic,
    "synthetic_attr": SyntheticAttr,
    "synthetic_t2i": SyntheticT2I,
    "synthetic_class": SyntheticClass,
    "real_img": RawImages,
    "ffhq256": RawImages,
    "celeba": RawImages,
    "imagenet": RawImages,
    "cifar10": RawImages,
}


def get_dataset(name: str, **kwargs) -> DatasetFactory:
    """Registry (reference datasets.py:1113-1158). T2I caption variants:
    pass ``output_caption=True`` or use the ``_withcaptioncontext`` alias.
    """
    if name == "mscoco256_features_withcaptioncontext":
        return MSCOCO256Features(output_caption=True, **kwargs)
    if name not in _REGISTRY:
        raise NotImplementedError(name)
    return _REGISTRY[name](**kwargs)

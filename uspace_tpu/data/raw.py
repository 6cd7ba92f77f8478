"""Raw image datasets feeding the feature-extraction pipelines.

Counterpart of `/root/reference/lfm_dataset/` + the raw entries in
`datasets.py` (CelebAMask-HQ with 40 attrs, FFHQ, AFHQ, MetFaces, LSUN
churches, MM-CelebA-HQ images+captions, generic image folders). All
return [H, W, 3] float32 in [-1, 1] (the reference's transform stack:
resize/center-crop then normalize) plus optional 'attr'/'caption'.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .datasets import Dataset

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def list_images(root: str, recursive: bool = True) -> List[str]:
    out = []
    if recursive:
        for base, _dirs, files in sorted(os.walk(root)):
            out.extend(os.path.join(base, f) for f in sorted(files)
                       if f.lower().endswith(IMG_EXTS))
    else:
        out = [os.path.join(root, f) for f in sorted(os.listdir(root))
               if f.lower().endswith(IMG_EXTS)]
    return out


def load_image(path: str, resolution: Optional[int] = None,
               center_crop: bool = True, resample=None) -> np.ndarray:
    """[H, W, 3] float32 in [-1, 1]."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if resolution is not None:
        if center_crop:
            w, h = img.size
            s = min(w, h)
            img = img.crop(((w - s) // 2, (h - s) // 2,
                            (w + s) // 2, (h + s) // 2))
        img = img.resize((resolution, resolution),
                         resample or Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 127.5 - 1.0
    return arr


class ImageFolder(Dataset):
    """Generic folder of images (reference Real_IMG_DS / FFHQ / AFHQ /
    MetFaces / churches adapters)."""

    def __init__(self, path: str, resolution: int = 256,
                 recursive: bool = True):
        self.files = list_images(path, recursive)
        if not self.files:
            raise FileNotFoundError(f"no images under {path}")
        self.resolution = resolution

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        return {"image": load_image(self.files[idx], self.resolution),
                "path": self.files[idx]}


def parse_celeba_attrs(attr_file: str) -> Dict[str, np.ndarray]:
    """Parse CelebA(-HQ) list_attr files: name -> 40-dim 0/1 vector
    (reference lfm_dataset/celeba.py:17-60; -1/1 mapped to 0/1)."""
    with open(attr_file) as f:
        lines = [l.rstrip() for l in f if l.strip()]
    # line 0: count; line 1: attr names; rest: filename then 40 values
    names = lines[1].split()
    out = {}
    for line in lines[2:]:
        parts = line.split()
        vals = np.array([(1 if int(v) == 1 else 0) for v in parts[1:]],
                        np.int64)
        assert len(vals) == len(names), (len(vals), len(names))
        out[parts[0]] = vals
    return out


class CelebAMaskHQ(Dataset):
    """CelebAMask-HQ images + 40 CelebA attributes (reference
    lfm_dataset/celebamask30k_1024.py:84-238; the HQ->CelebA index
    mapping file links each HQ image to its original attr row)."""

    def __init__(self, path: str, resolution: int = 256,
                 attr_file: Optional[str] = None,
                 mapping_file: Optional[str] = None):
        img_dir = os.path.join(path, "CelebA-HQ-img")
        if not os.path.isdir(img_dir):
            img_dir = path
        self.files = list_images(img_dir, recursive=False)
        self.resolution = resolution
        self.attrs = None
        if attr_file and not os.path.exists(attr_file):
            raise FileNotFoundError(
                f"attr_file {attr_file!r} does not exist (a silent "
                "fallback would train without attributes)")
        if attr_file and os.path.exists(attr_file):
            by_name = parse_celeba_attrs(attr_file)
            mapping = {}
            if mapping_file and os.path.exists(mapping_file):
                with open(mapping_file) as f:
                    header = f.readline().split()
                    for line in f:
                        parts = line.split()
                        # idx orig_idx orig_file
                        mapping[int(parts[0])] = parts[-1]
            self.attrs = []
            misses = 0
            for fpath in self.files:
                stem = os.path.splitext(os.path.basename(fpath))[0]
                orig = mapping.get(int(stem), f"{stem}.jpg") \
                    if stem.isdigit() else f"{stem}.jpg"
                row = by_name.get(orig)
                if row is None:
                    misses += 1
                    row = np.zeros(40, np.int64)
                self.attrs.append(row)
            if misses == len(self.files):
                # HQ stems ('0'..'29999') vs original zero-padded CelebA
                # names ('000001.jpg'): without the HQ->orig mapping file
                # every lookup misses and directions degrade to zeros
                raise ValueError(
                    f"no attr rows matched any of {len(self.files)} images "
                    f"in {attr_file}; pass mapping_file "
                    "(CelebA-HQ-to-CelebA-mapping.txt)")
            if misses:
                import warnings

                warnings.warn(f"{misses}/{len(self.files)} images have no "
                              "attr row (zeros substituted)")

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        out = {"image": load_image(self.files[idx], self.resolution)}
        if self.attrs is not None:
            out["attr"] = self.attrs[idx]
        return out


class CaptionedImageFolder(Dataset):
    """Images + sidecar caption .txt files (reference MMCelebAHQ,
    datasets.py:836-906: image ``{i}.jpg`` with ``{i}.txt`` holding one
    caption per line)."""

    def __init__(self, image_dir: str, caption_dir: Optional[str] = None,
                 resolution: int = 256):
        self.files = list_images(image_dir, recursive=False)
        self.caption_dir = caption_dir or image_dir
        self.resolution = resolution

    def __len__(self):
        return len(self.files)

    def captions_for(self, idx: int) -> List[str]:
        stem = os.path.splitext(os.path.basename(self.files[idx]))[0]
        cap_file = os.path.join(self.caption_dir, stem + ".txt")
        if not os.path.exists(cap_file):
            return [""]
        with open(cap_file) as f:
            caps = [l.strip() for l in f if l.strip()]
        return caps or [""]

    def __getitem__(self, idx):
        caps = self.captions_for(idx)
        return {"image": load_image(self.files[idx], self.resolution),
                "captions": caps}


class TxtListedImages(Dataset):
    """Images listed in a txt file, relative to ``data_root`` — the
    reference's LSUN adapter format (`lfm_dataset/lsun.py:10-64`:
    churches/bedrooms/cats "flat" dumps + ``*_train.txt`` path lists,
    score-sde center-crop preprocessing, p=0.5 horizontal flip for
    train). The flip is keyed on (seed, idx, epoch) so epochs vary but
    runs are bit-reproducible (see datasets._EpochRng)."""

    def __init__(self, txt_file: str, data_root: str, resolution: int = 256,
                 flip_p: float = 0.5, seed: int = 0):
        from .datasets import _EpochRng

        with open(txt_file) as f:
            names = [l.strip() for l in f if l.strip()]
        self.files = [os.path.join(data_root, n) for n in names]
        if not self.files:
            raise FileNotFoundError(f"empty list {txt_file}")
        self.resolution = resolution
        self.flip_p = flip_p
        self._rng = _EpochRng(seed)

    def set_epoch(self, epoch: int) -> None:
        self._rng.epoch = epoch

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        img = load_image(self.files[idx], self.resolution)
        if self.flip_p > 0 and self._rng.for_index(idx).random() < self.flip_p:
            img = img[:, ::-1].copy()
        return {"image": img, "path": self.files[idx]}


# FFHQ 11-attribute order (reference lfm_dataset/ffhq_from1024.py:114-139,
# consumed by tools/utils_attr.py FFHQ_ATTR11)
FFHQ_ATTR11_KEYS = (
    "gender", "smile", "no_glasses", "anger", "contempt", "disgust",
    "fear", "happiness", "neutral", "sadness", "surprise",
)


def face_attributes_to_attr11(face: Dict) -> np.ndarray:
    """MS-Face-API ``faceAttributes`` dict -> 11-dim 0/1 vector
    (reference ffhq_from1024.py:114-139 thresholds)."""
    emotion = face["emotion"]
    vals = [
        0 if face["gender"] == "female" else 1,
        1 if face["smile"] > 0.5 else 0,
        1 if face["glasses"] == "NoGlasses" else 0,
    ] + [1 if emotion[k] > 0.5 else 0
         for k in ("anger", "contempt", "disgust", "fear", "happiness",
                   "neutral", "sadness", "surprise")]
    return np.array(vals, np.int64)


def load_ffhq_attr11(path: str) -> Dict[str, np.ndarray]:
    """Load FFHQ attr11 vectors from either format the reference uses:

    - a consolidated json mapping image-id -> 11-vector
      (`lfm_dataset/data_files/ffhq_train_attr_v2.json`), or
    - a directory of per-image ``{id}.json`` MS-Face-API files
      (`ffhq-features-dataset/json`, parsed by ffhq_from1024.py:103-139).
    """
    import json

    out: Dict[str, np.ndarray] = {}
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(path, name)) as f:
                try:
                    data = json.load(f)
                    attr = face_attributes_to_attr11(data[0]["faceAttributes"])
                except (KeyError, IndexError, ValueError):
                    continue  # images with no detected face are skipped
            out[os.path.splitext(name)[0]] = attr
    else:
        with open(path) as f:
            data = json.load(f)
        for k, v in data.items():
            out[str(k)] = np.asarray(v, np.int64)
    return out


class FFHQAttr11(Dataset):
    """FFHQ images + 11 attributes (reference ffhq_from1024.py): a split
    txt of relative names, images resized bilinear (no crop — FFHQ is
    square), and attrs from :func:`load_ffhq_attr11`. Images without an
    attr entry are filtered out, matching ``filter_path``."""

    def __init__(self, root: str, attr_path: str,
                 split_file: Optional[str] = None, resolution: int = 256):
        if split_file:
            with open(split_file) as f:
                names = [l.strip() for l in f if l.strip()]
            files = [os.path.join(root, n) for n in names]
        else:
            files = list_images(root)
        attrs = load_ffhq_attr11(attr_path)
        self.files, self.attrs = [], []
        for fpath in files:
            img_id = os.path.splitext(os.path.basename(fpath))[0]
            if img_id in attrs:
                self.files.append(fpath)
                self.attrs.append(attrs[img_id])
        if not self.files:
            raise FileNotFoundError(
                f"no images in {root} with attrs in {attr_path}")
        self.resolution = resolution

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        # reference resizes bilinear without cropping (ffhq_from1024.py:86)
        from PIL import Image

        arr = load_image(self.files[idx], self.resolution,
                         center_crop=False, resample=Image.BILINEAR)
        return {"image": arr, "attr": self.attrs[idx]}


class ImageNet100(Dataset):
    """ImageNet class-subset adapter (reference lfm_dataset/
    imagenet100.py): ``class_list_file`` holds one wnid folder name per
    line; the label of an image is its wnid's index in that list (the
    generic ImageFolder loses this mapping)."""

    def __init__(self, root: str, class_list_file: str,
                 resolution: int = 256):
        with open(class_list_file) as f:
            self.wnids = [l.strip() for l in f if l.strip()]
        self.files: List[str] = []
        self.labels: List[int] = []
        for cls_id, wnid in enumerate(self.wnids):
            folder = os.path.join(root, wnid)
            if not os.path.isdir(folder):
                raise FileNotFoundError(folder)
            for fpath in list_images(folder, recursive=False):
                self.files.append(fpath)
                self.labels.append(cls_id)
        self.resolution = resolution

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        return {"image": load_image(self.files[idx], self.resolution),
                "y": np.int64(self.labels[idx])}


class MSCOCODatabase(Dataset):
    """MSCOCO images + annotation captions (reference datasets.py:909-947,
    pycocotools-based). This version reads the annotation JSON directly —
    no pycocotools dependency."""

    def __init__(self, root: str, annFile: str, size: int = 256):
        import json

        self.root = root
        self.size = size
        with open(annFile) as f:
            ann = json.load(f)
        self.images = sorted(ann["images"], key=lambda x: x["id"])
        caps: Dict[int, List[str]] = {}
        for a in ann["annotations"]:
            caps.setdefault(a["image_id"], []).append(a["caption"])
        self.captions = caps

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        info = self.images[idx]
        img = load_image(os.path.join(self.root, info["file_name"]),
                         self.size)
        return {"image": img,
                "captions": self.captions.get(info["id"], [""])}

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
               center_crop: bool = True) -> np.ndarray:
    """[H, W, 3] float32 in [-1, 1]."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if resolution is not None:
        if center_crop:
            w, h = img.size
            s = min(w, h)
            img = img.crop(((w - s) // 2, (h - s) // 2,
                            (w + s) // 2, (h + s) // 2))
        img = img.resize((resolution, resolution), Image.BICUBIC)
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
            for fpath in self.files:
                stem = os.path.splitext(os.path.basename(fpath))[0]
                orig = mapping.get(int(stem), f"{stem}.jpg") \
                    if stem.isdigit() else f"{stem}.jpg"
                self.attrs.append(by_name.get(orig, np.zeros(40, np.int64)))

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

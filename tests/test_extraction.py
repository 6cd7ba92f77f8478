"""Extraction pipeline tests: raw datasets -> features on disk -> read
back through the feature datasets (full round trip of the data layer)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from uspace_tpu.data.datasets import (
    CaptionFeatureDataset,
    H5FeatureDataset,
    NpyFeatureDataset,
)
from uspace_tpu.data.extraction import (
    extract_empty_context,
    extract_features_h5,
    extract_features_npy,
    extract_t2i_features,
    extract_test_prompts,
)
from uspace_tpu.data.raw import (
    CaptionedImageFolder,
    ImageFolder,
    MSCOCODatabase,
    load_image,
    parse_celeba_attrs,
)


def _fake_encoder(images):
    """Stand-in for the VAE: downsample 4x and duplicate channels to
    mimic [B, h, w, 2C] moments."""
    x = jnp.asarray(images)
    x = x[:, ::4, ::4, :]
    return jnp.concatenate([x, jnp.zeros_like(x) - 30.0], axis=-1)[..., :8]


def _fake_text_encoder(caps):
    return np.stack([np.full((5, 16), float(len(c)), np.float32)
                     for c in caps])


@pytest.fixture
def image_dir(tmp_path, np_rng):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(6):
        arr = (np_rng.random((32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i}.png")
    return str(d)


class TestRaw:
    def test_image_folder(self, image_dir):
        ds = ImageFolder(image_dir, resolution=16)
        assert len(ds) == 6
        img = ds[0]["image"]
        assert img.shape == (16, 16, 3)
        assert -1.0 <= img.min() and img.max() <= 1.0

    def test_load_image_center_crop(self, tmp_path):
        arr = np.zeros((20, 40, 3), np.uint8)
        arr[:, 10:30] = 255  # center square white
        p = tmp_path / "a.png"
        Image.fromarray(arr).save(p)
        img = load_image(str(p), resolution=8)
        np.testing.assert_allclose(img, 1.0)  # crop kept only the center

    def test_captioned_folder(self, image_dir):
        for i in range(6):
            with open(os.path.join(image_dir, f"{i}.txt"), "w") as f:
                f.write(f"caption {i} a\ncaption {i} b\n")
        ds = CaptionedImageFolder(image_dir, resolution=16)
        s = ds[2]
        assert s["captions"] == ["caption 2 a", "caption 2 b"]

    def test_celeba_attr_parsing(self, tmp_path):
        f = tmp_path / "attrs.txt"
        f.write_text("2\nSmiling Male\n0.jpg 1 -1\n1.jpg -1 1\n")
        attrs = parse_celeba_attrs(str(f))
        np.testing.assert_array_equal(attrs["0.jpg"], [1, 0])
        np.testing.assert_array_equal(attrs["1.jpg"], [0, 1])

    def test_mscoco_database(self, tmp_path, image_dir):
        import json

        ann = {
            "images": [{"id": 7, "file_name": "0.png"},
                       {"id": 3, "file_name": "1.png"}],
            "annotations": [{"image_id": 7, "caption": "a dog"},
                            {"image_id": 7, "caption": "a big dog"},
                            {"image_id": 3, "caption": "a cat"}],
        }
        af = tmp_path / "ann.json"
        af.write_text(json.dumps(ann))
        ds = MSCOCODatabase(image_dir, str(af), size=16)
        assert len(ds) == 2
        assert ds[0]["captions"] == ["a cat"]  # sorted by id: 3 first
        assert len(ds[1]["captions"]) == 2


class TestExtraction:
    def test_npy_roundtrip(self, tmp_path, image_dir):
        ds = ImageFolder(image_dir, resolution=32)
        out = str(tmp_path / "feat")
        n = extract_features_npy(ds, _fake_encoder, out, batch_size=4)
        assert n == 6
        back = NpyFeatureDataset(out, fmt="pair")
        assert len(back) == 6
        assert back[0]["x"].shape == (8, 8, 6)  # NHWC after transpose

    def test_npy_with_attrs_roundtrip(self, tmp_path, image_dir):
        class WithAttr(ImageFolder):
            def __getitem__(self, idx):
                s = super().__getitem__(idx)
                s["attr"] = np.array([idx % 2, 1 - idx % 2], np.int64)
                return s

        ds = WithAttr(image_dir, resolution=32)
        out = str(tmp_path / "feat")
        extract_features_npy(ds, _fake_encoder, out, batch_size=3)
        back = NpyFeatureDataset(out, fmt="cond")
        s = back[1]
        np.testing.assert_array_equal(s["attr"], [1, 0])

    def test_flip_doubles(self, tmp_path, image_dir):
        ds = ImageFolder(image_dir, resolution=32)
        out = str(tmp_path / "feat")
        n = extract_features_npy(ds, _fake_encoder, out, flip=True)
        assert n == 12
        assert os.path.exists(out + "/11.npy")

    def test_h5_roundtrip(self, tmp_path, image_dir):
        ds = ImageFolder(image_dir, resolution=32)
        out = str(tmp_path / "f.h5")
        n = extract_features_h5(ds, _fake_encoder, out, batch_size=4)
        back = H5FeatureDataset(out)
        assert len(back) == n == 6

    def test_t2i_roundtrip(self, tmp_path, image_dir):
        for i in range(6):
            with open(os.path.join(image_dir, f"{i}.txt"), "w") as f:
                f.write("first cap\nsecond cap\n")
        ds = CaptionedImageFolder(image_dir, resolution=32)
        out = str(tmp_path / "t2i")
        n = extract_t2i_features(ds, _fake_encoder, _fake_text_encoder, out,
                                 batch_size=4)
        assert n == 6
        back = CaptionFeatureDataset(out, output_caption=True)
        assert len(back) == 6
        s = back[0]
        assert s["x"].shape == (8, 8, 6)
        assert s["context"].shape == (5, 16)
        assert s["caption"] in ("first cap", "second cap")

    def test_empty_and_prompts(self, tmp_path):
        p = extract_empty_context(_fake_text_encoder, str(tmp_path))
        assert np.load(p).shape == (5, 16)
        rv = extract_test_prompts(["a cat", "a dog"], _fake_text_encoder,
                                  str(tmp_path))
        prompt, ctx = np.load(os.path.join(rv, "0.npy"), allow_pickle=True)
        assert prompt == "a cat" and np.asarray(ctx).shape == (5, 16)

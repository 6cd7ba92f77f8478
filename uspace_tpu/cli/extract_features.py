"""Feature-extraction CLI (replaces the reference's 16 per-dataset
scripts under `/root/reference/scripts/` with one parameterized tool):

    python -m uspace_tpu.cli.extract_features \
        --images=/data/celebamask/CelebA-HQ-img --resolution=256 \
        --vae=assets/stable-diffusion/autoencoder_kl.pth \
        --out=assets/datasets/celebamask256_features --format=npy

    # T2I (images + sidecar caption .txt files + CLIP):
    ... --captions=/data/mmcelebahq/captions --clip=<clip_dir> --format=t2i

    # CFG null context + fixed eval prompts:
    ... --empty_context --prompts="a cat,a dog"
"""

from __future__ import annotations

import os

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
if "images" not in FLAGS:
    flags.DEFINE_string("images", None, "raw image dir (or MSCOCO root)")
if "captions" not in FLAGS:
    flags.DEFINE_string("captions", None, "caption dir (sidecar txt) if separate")
if "ann_file" not in FLAGS:
    flags.DEFINE_string("ann_file", None, "MSCOCO annotation json (switches to "
                                          "MSCOCODatabase)")
if "attr_file" not in FLAGS:
    flags.DEFINE_string("attr_file", None, "CelebA list_attr file (adds attrs)")
if "ffhq_attr" not in FLAGS:
    flags.DEFINE_string("ffhq_attr", None,
                        "FFHQ attr11 source: consolidated json or dir of "
                        "per-image MS-Face-API jsons (h5 attr extraction, "
                        "reference h5_extract_ffhq_feature_with_attr.py)")
if "list_file" not in FLAGS:
    flags.DEFINE_string("list_file", None,
                        "txt of relative image paths under --images (LSUN "
                        "churches/bedrooms lists; FFHQ split lists with "
                        "--ffhq_attr)")
if "class_list" not in FLAGS:
    flags.DEFINE_string("class_list", None,
                        "wnid-per-line class list (ImageNet100 subset; "
                        "label = line index)")
if "vae" not in FLAGS:
    flags.DEFINE_string("vae", "assets/stable-diffusion/autoencoder_kl.pth",
                        "SD VAE torch checkpoint")
if "clip" not in FLAGS:
    flags.DEFINE_string("clip", None, "local CLIP dir (torch weights + tokenizer)")
if "out" not in FLAGS:
    flags.DEFINE_string("out", None, "output dir / h5 path")
if "resolution" not in FLAGS:
    flags.DEFINE_integer("resolution", 256, "image resolution")
if "batch_size" not in FLAGS:
    flags.DEFINE_integer("batch_size", 64, "encode batch size")
if "format" not in FLAGS:
    flags.DEFINE_enum("format", "npy", ["npy", "h5", "t2i"], "output format")
if "flip" not in FLAGS:
    flags.DEFINE_bool("flip", False, "add horizontally flipped copies")
if "empty_context" not in FLAGS:
    flags.DEFINE_bool("empty_context", False, "also write empty_context.npy")
if "prompts" not in FLAGS:
    flags.DEFINE_string("prompts", None, "comma-separated eval prompts for "
                                         "run_vis/")


def _build_text_encoder():
    import transformers

    from ..codecs.clip_text import FrozenCLIPEmbedder, clip_torch_to_flax
    from ..codecs.convert import load_torch_checkpoint

    clip_dir = FLAGS.clip
    weights = os.path.join(clip_dir, "pytorch_model.bin")
    if not os.path.exists(weights):
        weights = clip_dir  # direct file path
    tokenizer = transformers.CLIPTokenizer.from_pretrained(
        clip_dir if os.path.isdir(clip_dir) else os.path.dirname(clip_dir))
    params = {"params": clip_torch_to_flax(load_torch_checkpoint(weights))}
    emb = FrozenCLIPEmbedder(params, tokenizer)
    return lambda caps: np.asarray(emb.encode(caps))


def main(argv):
    from ..codecs.convert import load_torch_checkpoint, vae_torch_to_flax
    from ..data import extraction

    if FLAGS.format == "t2i" and not FLAGS.clip:
        raise flags.ValidationError(
            "--format=t2i encodes captions and requires --clip "
            "(local CLIP dir with torch weights + tokenizer)")
    from ..data.raw import (
        CaptionedImageFolder,
        CelebAMaskHQ,
        FFHQAttr11,
        ImageFolder,
        ImageNet100,
        MSCOCODatabase,
        TxtListedImages,
    )

    vae_params = {"params": vae_torch_to_flax(
        load_torch_checkpoint(FLAGS.vae))}
    encode_moments = extraction.make_vae_encoder(vae_params)

    if FLAGS.ann_file:
        ds = MSCOCODatabase(FLAGS.images, FLAGS.ann_file, FLAGS.resolution)
    elif FLAGS.format == "t2i" or FLAGS.captions:
        ds = CaptionedImageFolder(FLAGS.images, FLAGS.captions,
                                  FLAGS.resolution)
    elif FLAGS.ffhq_attr:
        ds = FFHQAttr11(FLAGS.images, FLAGS.ffhq_attr, FLAGS.list_file,
                        FLAGS.resolution)
    elif FLAGS.class_list:
        ds = ImageNet100(FLAGS.images, FLAGS.class_list, FLAGS.resolution)
    elif FLAGS.list_file:
        # extraction is a deterministic offline job: no flip augmentation
        ds = TxtListedImages(FLAGS.list_file, FLAGS.images,
                             FLAGS.resolution, flip_p=0.0)
    elif FLAGS.attr_file:
        ds = CelebAMaskHQ(FLAGS.images, FLAGS.resolution, FLAGS.attr_file)
    else:
        ds = ImageFolder(FLAGS.images, FLAGS.resolution)

    if FLAGS.format == "npy":
        extraction.extract_features_npy(ds, encode_moments, FLAGS.out,
                                        FLAGS.batch_size, flip=FLAGS.flip)
    elif FLAGS.format == "h5":
        extraction.extract_features_h5(ds, encode_moments, FLAGS.out,
                                       FLAGS.batch_size)
    else:
        encode_text = _build_text_encoder()
        extraction.extract_t2i_features(ds, encode_moments, encode_text,
                                        FLAGS.out, FLAGS.batch_size)
        if FLAGS.empty_context:
            extraction.extract_empty_context(encode_text,
                                             os.path.dirname(FLAGS.out))
        if FLAGS.prompts:
            extraction.extract_test_prompts(
                FLAGS.prompts.split(","), encode_text,
                os.path.dirname(FLAGS.out))
    logging.info("done")


if __name__ == "__main__":
    app.run(main)
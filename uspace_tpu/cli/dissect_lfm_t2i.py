"""T2I attention-editing CLI (prompt-to-prompt / local-prompt).

Reference entry point: `/root/reference/dissect_lfm_t2i.py`. Modes (set
``--config.dissection.dissect_name``):

- ``p2p``: real-image editing — invert a captioned image to z, then decode
  while rescaling the attention columns of target context tokens
  (``token_kwargs.p2p_to_multiply`` phrase, ``p2p_multiplier``).
- ``local_prompt``: invert with the original caption, decode with a
  rewritten caption context (lp_replace / lp_remove / lp_add).
- ``sampled_image_editing``: generate from shared noise with caption list
  and a p2p multiplier sweep.

Saves before/after image pairs + optional attention-map heatmaps
(``--config.dissection.vis_am_path``).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags, logging
from ml_collections import config_flags

FLAGS = flags.FLAGS
if "config" not in FLAGS:
    config_flags.DEFINE_config_file("config", None, "experiment config",
                                    lock_config=False)
if "workdir" not in FLAGS:
    flags.DEFINE_string("workdir", "dissect_t2i_out", "output root")
flags.mark_flags_as_required(["config"])


def get_clip(config):
    """(embedder, tokenizer) when CLIP weights + tokenizer files exist
    locally, else (None, None) — flows that need re-encoding captions
    (local_prompt, free-form p2p phrases) require them."""
    path = config.clip.get("pretrained_path", "")
    if not path or not os.path.exists(path):
        return None, None
    import transformers

    from ..codecs.clip_text import FrozenCLIPEmbedder, clip_torch_to_flax
    from ..codecs.convert import load_torch_checkpoint

    tokenizer = transformers.CLIPTokenizer.from_pretrained(
        os.path.dirname(path))
    params = {"params": clip_torch_to_flax(load_torch_checkpoint(path))}
    return FrozenCLIPEmbedder(params, tokenizer), tokenizer


from .dissect_common import decode_images as _decode_images


def _joint_attn_seq_len(config) -> int:
    """Token count of the joint-attention layout — U-ViT-T2I only; the
    SD-UNet family conditions via cross-attention and has no single
    [time, ctx, patches] axis for p2p column rescale / attention maps."""
    if config.nnet.name != "uvit_t2i":
        raise NotImplementedError(
            f"{config.dissection.dissect_name}: joint-attention token "
            f"editing applies to uvit_t2i (got nnet.name="
            f"{config.nnet.name!r})")
    return 1 + config.nnet.num_clip_token + (
        config.nnet.img_size // config.nnet.patch_size) ** 2


def real_image_editing(config, session, vae_decode, workdir: str,
                       clip=None, tokenizer=None) -> None:
    """p2p / local_prompt on real captioned images
    (reference dissect_lfm_t2i.py:137-260)."""
    from ..data.datasets import get_dataset
    from ..data.loader import DataLoader
    from ..editing.attention_edit import (
        build_p2p_edit,
        local_prompt_rewrite,
        phrase_target_ids,
    )
    from ..utils.vis import save_image

    d = config.dissection
    tk = dict(d.token_kwargs)
    name = d.dissect_name
    dataset = get_dataset(**dict(config.dataset))
    split = "test" if getattr(dataset, "test", None) is not None else "train"
    loader = DataLoader(dataset.get_split(split), d.mini_batch_size,
                        shuffle=False, num_workers=config.dl.num_workers)
    batch = next(iter(loader))
    captions = batch.get("caption", [""] * len(batch["x"]))
    ctx = jnp.asarray(batch["context"])
    rng = jax.random.PRNGKey(config.seed)

    x = jnp.asarray(batch["x"])
    if session.vae_sample is not None:
        x = session.vae_sample(x, rng)
    else:
        from ..train.step import sample_from_moments

        x = sample_from_moments(x, rng)

    # exact inversion with the ORIGINAL context (no editing during encode)
    z = session.encode(x, {"context": ctx})

    if name == "local_prompt":
        if clip is None:
            raise RuntimeError("local_prompt needs CLIP weights "
                               "(config.clip.pretrained_path)")
        new_caps = local_prompt_rewrite(captions, tk)
        new_ctx = clip.encode(new_caps)
        edited = session.decode(z, {"context": new_ctx},
                                t_edit=float(d.t_edit))
        out_caps = new_caps
        attn_edit = None
    elif name == "p2p":
        seq_len = _joint_attn_seq_len(config)
        phrase = tk.get("p2p_to_multiply") or ""
        if tokenizer is None and not phrase.startswith("ids:"):
            raise RuntimeError(
                "p2p needs a CLIP tokenizer for phrase->token-id mapping "
                "(or pass explicit indices as p2p_to_multiply='ids:1,4')")
        ids = phrase_target_ids(captions, phrase, tokenizer)
        bid = tk.get("target_block_id", -1)
        attn_edit = build_p2p_edit(
            len(captions), seq_len, ids, tk.get("p2p_multiplier", 1.9),
            t_edit=float(d.t_edit),
            block_ids=None if bid in (-1, None) else (int(bid),),
        )
        edited = session.decode(z, {"context": ctx}, attn_edit=attn_edit)
        out_caps = captions
    else:
        raise NotImplementedError(name)

    before = _decode_images(vae_decode, session.decode(z, {"context": ctx}),
                            d.mini_batch_size)
    after = _decode_images(vae_decode, edited, d.mini_batch_size)
    for i, (b_img, a_img) in enumerate(zip(before, after)):
        save_image(b_img, os.path.join(workdir, f"{i}_before.png"))
        save_image(a_img, os.path.join(workdir, f"{i}_after.png"))
        with open(os.path.join(workdir, f"{i}_caption.txt"), "w") as f:
            f.write(f"{captions[i]}\n-> {out_caps[i]}\n")
    logging.info("%s: %d before/after pairs -> %s", name, len(before), workdir)


def sampled_image_editing(config, session, vae_decode, workdir: str,
                          clip=None, tokenizer=None) -> None:
    """Generate from shared noise under a p2p multiplier sweep
    (reference dissect_lfm_t2i.py:262-373)."""
    from ..configs.common import z_shape_hwc
    from ..data.datasets import get_dataset
    from ..editing.attention_edit import build_p2p_edit, phrase_target_ids
    from ..utils.vis import make_grid, save_image

    d = config.dissection
    tk = dict(d.token_kwargs)
    dataset = get_dataset(**dict(config.dataset))
    # captions+contexts from the dataset's fixed eval prompts or test split
    if getattr(dataset, "contexts", None) is not None and len(dataset.prompts):
        captions = list(dataset.prompts[:d.mini_batch_size])
        ctx = jnp.asarray(dataset.contexts[:d.mini_batch_size])
    else:
        split = dataset.get_split(
            "test" if getattr(dataset, "test", None) is not None else "train")
        samples = [split[i] for i in range(d.mini_batch_size)]
        captions = [s.get("caption", "") for s in samples]
        ctx = jnp.asarray(np.stack([s["context"] for s in samples]))

    n = len(captions)
    rng = jax.random.PRNGKey(config.seed)
    z_hwc = z_shape_hwc(config)
    if d.get("fixed_z_path"):
        z = jnp.asarray(np.load(d.fixed_z_path))[:n]
    else:
        z = jax.random.normal(rng, (n, *z_hwc))

    phrase = tk.get("p2p_to_multiply") or ""
    seq_len = _joint_attn_seq_len(config) if phrase else None
    multipliers = tk.get("p2p_multiplier", 1.9)
    if not isinstance(multipliers, (list, tuple)):
        multipliers = [multipliers]

    rows = []
    for mult in multipliers:
        if phrase and float(mult) != 1.0:
            if tokenizer is None and not phrase.startswith("ids:"):
                raise RuntimeError(
                    "sampled_image_editing p2p needs a CLIP tokenizer for "
                    "phrase->token-id mapping (or explicit indices as "
                    "p2p_to_multiply='ids:1,4')")
            ids = phrase_target_ids(captions, phrase, tokenizer)
            edit = build_p2p_edit(n, seq_len, ids, float(mult),
                                  t_edit=float(d.t_edit))
        else:
            edit = None
        lat = session.decode(z, {"context": ctx}, attn_edit=edit)
        rows.append(_decode_images(vae_decode, lat, d.mini_batch_size))
    grid = make_grid(np.concatenate(rows), nrow=n)
    out = os.path.join(workdir, "sampled_editing_sweep.png")
    save_image(grid, out)
    with open(os.path.join(workdir, "captions.txt"), "w") as f:
        f.write("\n".join(captions))
    logging.info("sampled_image_editing: %d multipliers x %d prompts -> %s",
                 len(multipliers), n, out)


def vis_attention(config, session, workdir: str, tokenizer=None) -> None:
    """Per-token cross-attention heatmaps at chosen timesteps/blocks
    (reference vis_attention_map, utils_t2i.py:141-193 — the reference
    renders these mid-ODE; here one forward per requested timestep with
    the probability-capture path)."""
    from ..data.datasets import get_dataset
    from ..editing.attention_edit import save_attention_maps, slice_context_attention
    from ..train.step import make_velocity_fn, sample_from_moments

    _joint_attn_seq_len(config)  # attention capture is joint-attention only
    d = config.dissection
    dataset = get_dataset(**dict(config.dataset))
    split = "test" if getattr(dataset, "test", None) is not None else "train"
    ds = dataset.get_split(split)
    samples = [ds[i] for i in range(d.mini_batch_size)]
    captions = [s.get("caption", "") for s in samples]
    ctx = jnp.asarray(np.stack([s["context"] for s in samples]))
    x = jnp.asarray(np.stack([s["x"] for s in samples]))
    rng = jax.random.PRNGKey(config.seed)
    if session.vae_sample is not None:
        x = session.vae_sample(x, rng)
    else:
        x = sample_from_moments(x, rng)
    block_id = d.token_kwargs.get("target_block_id", -1)
    blocks = (int(block_id),) if block_id not in (-1, None) else (0,)
    n_img = (config.nnet.img_size // config.nnet.patch_size) ** 2
    vf = make_velocity_fn(
        session.model, session.params, {"context": ctx},
        capture_attn=blocks,
    )
    for t in (0.1, 0.5, 0.9):
        _, taps = vf(jnp.full((x.shape[0],), t), x)
        for b in blocks:
            ctx_attn = slice_context_attention(
                taps[f"attn_{b}"], n_img, config.nnet.num_clip_token)
            save_attention_maps(np.asarray(ctx_attn), workdir, captions,
                                tokenizer=tokenizer, timestep=t, block_id=b)
    logging.info("attention maps -> %s", workdir)


def run(config, workdir: str) -> None:
    from .dissect_common import build_session

    os.makedirs(workdir, exist_ok=True)
    session, vae_decode = build_session(config)
    clip, tokenizer = get_clip(config)
    name = config.dissection.get("dissect_name")
    if name in ("p2p", "local_prompt"):
        real_image_editing(config, session, vae_decode, workdir, clip,
                           tokenizer)
    elif name == "sampled_image_editing":
        sampled_image_editing(config, session, vae_decode, workdir, clip,
                              tokenizer)
    elif name == "vis_attention":
        vis_attention(config, session, workdir, tokenizer)
    else:
        raise NotImplementedError(f"dissect_name={name!r}")


def main(argv):
    run(FLAGS.config, FLAGS.workdir)


if __name__ == "__main__":
    app.run(main)

"""T2I attention-editing mechanics: p2p targets, local-prompt rewriting,
attention-map extraction/visualization.

Counterpart of `/root/reference/tools/utils_t2i.py`: caption -> target
token ids (:112-138), local_prompt lp_replace/lp_remove/lp_add caption
rewriting (:299-322), and per-token attention heatmaps (:141-193). The
rescale itself lives in :class:`~uspace_tpu.editing.specs.AttnEdit` (and
is folded into V inside the attention kernel — see ops/attention.py).

Token layout (334 = 1 time + 77 context + 256 image tokens,
utils_t2i.py:20-22) is parameterized, not hardcoded.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..codecs.clip_text import get_word_inds
from .specs import AttnEdit, p2p_col_mult

Array = jnp.ndarray


def local_prompt_rewrite(captions: Sequence[str], token_kwargs: Dict
                         ) -> List[str]:
    """lp_replace / lp_remove / lp_add caption rewriting
    (utils_t2i.py:299-322)."""
    td = token_kwargs.get("token_dissect")
    if td == "lp_replace":
        return [c.replace(token_kwargs["lp_replace_from"],
                          token_kwargs["lp_replace_to"]) for c in captions]
    if td == "lp_remove":
        return [c.replace(token_kwargs["lp_to_remove"], " ")
                for c in captions]
    if td == "lp_add":
        return [c + " , " + token_kwargs["lp_to_add"] for c in captions]
    return list(captions)


def phrase_target_ids(
    captions: Sequence[str], phrase: str, tokenizer, max_targets: int = 8
) -> np.ndarray:
    """Per-caption context-token indices of ``phrase`` words, padded with
    -1 to [B, max_targets] (reference get_phrase_ids_from_caption,
    utils_t2i.py:112-138). Indices are context-relative (no time-token
    offset — AttnEdit/p2p_col_mult applies it).

    ``phrase`` may also be the literal form ``"ids:1,4"`` — explicit
    context-token indices, applied to every caption. That form needs no
    tokenizer, so the p2p CLI flows run on models whose contexts are not
    CLIP text (synthetic datasets, precomputed contexts)."""
    out = np.full((len(captions), max_targets), -1, np.int32)
    if phrase.startswith("ids:"):
        ids = [int(tok) for tok in phrase[4:].split(",") if tok.strip()]
        out[:, :min(len(ids), max_targets)] = ids[:max_targets]
        return out
    for b, cap in enumerate(captions):
        ids: List[int] = []
        for word in phrase.split(" "):
            ids.extend(int(i) for i in get_word_inds(cap, word, tokenizer))
        for j, i in enumerate(ids[:max_targets]):
            out[b, j] = i
    return out


def build_p2p_edit(
    batch: int,
    seq_len: int,
    target_ids: np.ndarray,
    multiplier,
    t_edit: float = 1.0,
    block_ids: Optional[Tuple[int, ...]] = None,
    time_tokens: int = 1,
) -> AttnEdit:
    """Assemble the AttnEdit for p2p_rescale (utils_t2i.py:241-262)."""
    mult = p2p_col_mult(batch, seq_len, jnp.asarray(target_ids), multiplier,
                        time_tokens=time_tokens)
    return AttnEdit(col_mult=mult, t_edit=t_edit, block_ids=block_ids)


def slice_context_attention(
    probs: Array, num_img_tokens: int = 256, num_context_tokens: int = 77,
) -> Array:
    """From full [B, H, L, L] probabilities, take the image-query x
    context-key block averaged over heads -> [B, img, ctx]
    (the quantity the reference visualizes, utils_t2i.py:141-193)."""
    img_q = probs[:, :, -num_img_tokens:, :]
    ctx_k = img_q[:, :, :, -(num_context_tokens + num_img_tokens):
                  -num_img_tokens]
    return ctx_k.mean(axis=1)


def attention_heatmaps(ctx_attn: Array) -> Array:
    """[B, img, ctx] -> [B, ctx, h, h] spatial heatmaps (img tokens are a
    square grid), normalized per map to [0, 1]."""
    b, n_img, n_ctx = ctx_attn.shape
    h = int(round(n_img**0.5))
    maps = ctx_attn.transpose(0, 2, 1).reshape(b, n_ctx, h, h)
    mn = maps.min(axis=(2, 3), keepdims=True)
    mx = maps.max(axis=(2, 3), keepdims=True)
    return (maps - mn) / jnp.maximum(mx - mn, 1e-8)


def save_attention_maps(
    ctx_attn: np.ndarray,
    out_dir: str,
    captions: Sequence[str],
    tokenizer=None,
    timestep: Optional[float] = None,
    block_id: Optional[int] = None,
    max_tokens: int = 20,
) -> None:
    """Write per-token heatmap PNGs with token captions
    (reference vis_attention_map, utils_t2i.py:141-193)."""
    from ..utils.vis import make_grid, save_image

    maps = np.asarray(attention_heatmaps(jnp.asarray(ctx_attn)))
    tag = ""
    if block_id is not None:
        tag += f"_block{block_id}"
    if timestep is not None:
        tag += f"_time{timestep:.2f}"
    for b, cap in enumerate(captions):
        toks = None
        if tokenizer is not None:
            toks = [tokenizer.decode([t]) for t in tokenizer.encode(cap)]
        n = min(max_tokens, maps.shape[1] if toks is None else len(toks))
        grid = make_grid(maps[b, :n, :, :, None], nrow=n)
        name = cap[:40].replace(" ", "_").replace("/", "_")
        save_image(grid, os.path.join(out_dir, f"{name}{tag}.png"))

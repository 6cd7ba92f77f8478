"""PyTorch checkpoint -> Flax parameter conversion.

The reference ships torch weights: the SD VAE (``autoencoder_kl.pth``),
CLIP text encoder (HF hub), U-ViT pretrained checkpoints
(``imagenet256_uvit_huge.pth`` etc.) and trained TrainState components
(`tools/utils_uvit.py:124-139`). These converters map torch state dicts
onto this package's Flax modules:

- Conv2d  NCHW ``[O, I, kh, kw]`` -> HWIO ``[kh, kw, I, O]`` kernels
  (activations here are NHWC).
- Linear  ``[O, I]`` -> ``[I, O]``.
- Norm ``weight`` -> ``scale``.
- Embedding ``weight`` -> ``embedding``.

Weight-surgery loaders (drop label/pos embeddings when transferring
across datasets — utils_uvit.py:140-166) are implemented as key filters.
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _nest(flat: Dict[Tuple[str, ...], np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value
    return tree




def _leaf(torch_key: str, arr: np.ndarray, is_embedding: bool = False
          ) -> Tuple[str, np.ndarray]:
    """Map a torch leaf tensor to (flax_leaf_name, converted_array)."""
    name = torch_key.rsplit(".", 1)[-1]
    if name == "bias":
        return "bias", arr
    if name != "weight":
        return name, arr  # e.g. raw Parameters like pos_embed
    if is_embedding:
        return "embedding", arr
    if arr.ndim == 4:
        return "kernel", arr.transpose(2, 3, 1, 0)
    if arr.ndim == 3:  # Conv1d [O, I, k] -> [k, I, O] (legacy UNet attention)
        return "kernel", arr.transpose(2, 1, 0)
    if arr.ndim == 2:
        return "kernel", arr.T
    # 1-D weight: norm scale
    return "scale", arr


def convert_state_dict(
    state_dict: Dict[str, Any],
    key_map: Callable[[str], Optional[Tuple[str, ...]]],
    embedding_keys: Sequence[str] = (),
) -> Dict[str, Any]:
    """Generic conversion: ``key_map`` maps a torch module path (without
    the trailing .weight/.bias) to a flax param path tuple, or None to
    drop the tensor."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for tkey, tval in state_dict.items():
        arr = _to_numpy(tval)
        mod_path, _, leaf_name = tkey.rpartition(".")
        if leaf_name in ("weight", "bias"):
            base = mod_path
        else:  # bare parameter (e.g. pos_embed)
            base = tkey
        fpath = key_map(base)
        if fpath is None:
            continue
        is_emb = any(base.endswith(e) for e in embedding_keys)
        lname, conv = _leaf(tkey, arr, is_embedding=is_emb)
        if leaf_name in ("weight", "bias"):
            flat[tuple(fpath) + (lname,)] = conv
        else:
            flat[tuple(fpath)] = conv
    return _nest(flat)


# ---------------------------------------------------------------------------
# SD VAE (libs/autoencoder.py -> codecs/vae.py)
# ---------------------------------------------------------------------------


def _vae_key_map(base: str) -> Optional[Tuple[str, ...]]:
    # flatten torch's nested module lists into this package's flat names:
    # encoder.down.0.block.1.conv1 -> encoder/down_0_block_1/conv1
    b = base
    b = re.sub(r"\bdown\.(\d+)\.block\.(\d+)", r"down_\1_block_\2", b)
    b = re.sub(r"\bdown\.(\d+)\.attn\.(\d+)", r"down_\1_attn_\2", b)
    b = re.sub(r"\bdown\.(\d+)\.downsample", r"down_\1_downsample", b)
    b = re.sub(r"\bup\.(\d+)\.block\.(\d+)", r"up_\1_block_\2", b)
    b = re.sub(r"\bup\.(\d+)\.attn\.(\d+)", r"up_\1_attn_\2", b)
    b = re.sub(r"\bup\.(\d+)\.upsample", r"up_\1_upsample", b)
    b = b.replace("mid.block_1", "mid_block_1")
    b = b.replace("mid.block_2", "mid_block_2")
    b = b.replace("mid.attn_1", "mid_attn_1")
    return tuple(b.split("."))


def vae_torch_to_flax(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert the reference ``autoencoder_kl.pth`` state dict to params
    for :class:`uspace_tpu.codecs.vae.AutoencoderKL` (wrap as
    ``{"params": result}`` for ``.apply``)."""
    return convert_state_dict(state_dict, _vae_key_map)


# ---------------------------------------------------------------------------
# U-ViT / U-ViT-T2I (libs/uvit.py, libs/uvit_t2i.py -> models/)
# ---------------------------------------------------------------------------


def _uvit_key_map(base: str) -> Optional[Tuple[str, ...]]:
    b = base
    b = re.sub(r"\bin_blocks\.(\d+)", r"in_blocks_\1", b)
    b = re.sub(r"\bout_blocks\.(\d+)", r"out_blocks_\1", b)
    # mlp_time_embed Sequential: time_embed.0 / time_embed.2
    b = b.replace("time_embed.0", "time_embed_fc1")
    b = b.replace("time_embed.2", "time_embed_fc2")
    return tuple(b.split("."))


def uvit_torch_to_flax(
    state_dict: Dict[str, Any],
    drop: Iterable[str] = (),
) -> Dict[str, Any]:
    """Convert a torch U-ViT / U-ViT-T2I checkpoint.

    ``drop`` lists key prefixes to discard — the reference's weight
    surgery: ``load_nnet_only`` drops label_emb+pos_embed,
    ``load_nnet_mscoco_or_in256`` drops pos_embed (utils_uvit.py:140-166).
    """
    drop = tuple(drop)

    def key_map(base: str):
        if any(base.startswith(d) for d in drop):
            return None
        return _uvit_key_map(base)

    return convert_state_dict(state_dict, key_map,
                              embedding_keys=("label_emb",))


def merge_params(converted: Dict[str, Any], initialized: Dict[str, Any],
                 on_unused: str = "warn") -> Dict[str, Any]:
    """Overlay converted weights onto a freshly initialized param tree,
    keeping initialized values for keys the conversion dropped (the
    weight-surgery pattern: new pos_embed/label_emb, pretrained rest).

    Raises on shape mismatch. Converted tensors whose mapped path does
    not exist in the init tree indicate a key-mapping problem and are
    reported (``on_unused``: "warn" | "raise" | "ignore") instead of
    being silently discarded."""
    used = set()

    def merge(a: Dict[str, Any], b: Dict[str, Any], prefix=""):
        out = {}
        for k, bv in b.items():
            if k in a:
                av = a[k]
                if isinstance(bv, dict):
                    used.add(prefix + k)
                    out[k] = merge(av, bv, prefix + k + "/")
                else:
                    if tuple(np.shape(av)) != tuple(np.shape(bv)):
                        raise ValueError(
                            f"shape mismatch at {prefix + k}: "
                            f"{np.shape(av)} vs {np.shape(bv)}"
                        )
                    used.add(prefix + k)
                    out[k] = np.asarray(av, dtype=np.asarray(bv).dtype)
            else:
                out[k] = bv
        return out

    result = merge(converted, initialized)

    def find_unused(tree: Dict[str, Any], prefix=""):
        out = []
        for k, v in tree.items():
            p = prefix + k
            if isinstance(v, dict):
                if p in used:
                    out.extend(find_unused(v, p + "/"))
                else:
                    out.append(p)
            elif p not in used:
                out.append(p)
        return out

    unused = find_unused(converted)
    if unused and on_unused != "ignore":
        msg = (f"{len(unused)} converted tensors matched no target param "
               f"(key-mapping drift?): {unused[:8]}")
        if on_unused == "raise":
            raise ValueError(msg)
        from absl import logging as _logging

        _logging.warning(msg)
    return result


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a .pth state dict without requiring CUDA. Strips common
    prefixes (``model.diffusion_model.`` for SD LDM UNet checkpoints —
    utils_uvit.py:168-209; ``module.`` for DDP)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        # strip repeatedly: DDP-saved LDM checkpoints are keyed
        # "module.model.diffusion_model.*" — a single ordered pass would
        # only remove "module." and leave every mapped key wrong
        stripped = True
        while stripped:
            stripped = False
            for pref in ("model.diffusion_model.", "module."):
                if k.startswith(pref):
                    k = k[len(pref):]
                    stripped = True
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# SD UNet (libs/sd/openaimodel.py -> models/unet.py)
# ---------------------------------------------------------------------------


def _unet_key_map(base: str) -> Optional[Tuple[str, ...]]:
    b = base
    b = b.replace("time_embed.0", "time_embed_fc1")
    b = b.replace("time_embed.2", "time_embed_fc2")
    # Up/Downsample convs inside block sequences
    b = re.sub(r"\binput_blocks\.(\d+)\.0\.op$", r"input_blocks_\1_0_down", b)
    b = re.sub(r"\boutput_blocks\.(\d+)\.(\d+)\.conv$", r"output_blocks_\1_up", b)
    b = re.sub(r"\binput_blocks\.(\d+)\.(\d+)", r"input_blocks_\1_\2", b)
    b = re.sub(r"\boutput_blocks\.(\d+)\.(\d+)", r"output_blocks_\1_\2", b)
    b = re.sub(r"\bmiddle_block\.(\d+)", r"middle_block_\1", b)
    # ResBlock internals
    b = b.replace("in_layers.0", "in_norm")
    b = b.replace("in_layers.2", "in_conv")
    b = b.replace("emb_layers.1", "emb_proj")
    b = b.replace("out_layers.0", "out_norm")
    b = b.replace("out_layers.3", "out_conv")
    b = b.replace("skip_connection", "skip")
    # SpatialTransformer internals
    b = re.sub(r"\btransformer_blocks\.(\d+)", r"blocks_\1", b)
    b = b.replace("to_out.0", "to_out")
    b = b.replace("ff.net.0.proj", "ff.geglu_proj")
    b = b.replace("ff.net.2", "ff.out")
    # output head
    b = b.replace("out.0", "out_norm")
    b = b.replace("out.2", "out_conv")
    if b.endswith("context_fixed"):
        return None
    return tuple(b.split("."))


def unet_torch_to_flax(
    state_dict: Dict[str, Any],
    drop_cross_attention: bool = False,
) -> Dict[str, Any]:
    """Convert an SD/guided-diffusion UNet checkpoint (after the
    ``model.diffusion_model.`` prefix strip done by
    :func:`load_torch_checkpoint`).

    ``drop_cross_attention`` reproduces ``load_sd_unet_remove_attention``
    (utils_uvit.py:168-209): discard attn2 weights so the cross-attention
    is re-initialized for a new conditioning space.
    """

    def key_map(base: str):
        if drop_cross_attention and ".attn2." in base:
            return None
        return _unet_key_map(base)

    return convert_state_dict(state_dict, key_map,
                              embedding_keys=("label_emb",))


# ---------------------------------------------------------------------------
# Reverse conversion: Flax params -> torch state dict (export)
# ---------------------------------------------------------------------------


def _flatten(tree: Dict[str, Any], prefix: Tuple[str, ...] = ()
             ) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def uvit_flax_to_torch(params: Dict[str, Any]) -> Dict[str, Any]:
    """Export U-ViT / U-ViT-T2I params to the reference's torch state-dict
    format (inverse of :func:`uvit_torch_to_flax`) so models trained here
    can be loaded back into the PyTorch stack."""
    out = {}
    for path, arr in _flatten(params.get("params", params)).items():
        parts = list(path)
        leaf = parts.pop()
        base = ".".join(parts)
        # flat module names back to torch's nested lists
        base = re.sub(r"\bin_blocks_(\d+)", r"in_blocks.\1", base)
        base = re.sub(r"\bout_blocks_(\d+)", r"out_blocks.\1", base)
        base = base.replace("time_embed_fc1", "time_embed.0")
        base = base.replace("time_embed_fc2", "time_embed.2")
        if leaf == "kernel":
            if arr.ndim == 4:
                t = arr.transpose(3, 2, 0, 1)
            else:
                t = arr.T
            out[f"{base}.weight"] = t
        elif leaf == "scale":
            out[f"{base}.weight"] = arr
        elif leaf == "embedding":
            out[f"{base}.weight"] = arr
        elif leaf == "bias":
            out[f"{base}.bias"] = arr
        else:  # bare params (pos_embed)
            out[".".join(parts + [leaf])] = arr
    return out


def unet_flax_to_torch(params: Dict[str, Any]) -> Dict[str, Any]:
    """Export SD-UNet params to the reference's torch state-dict format
    (inverse of :func:`unet_torch_to_flax`;
    `/root/reference/libs/sd/openaimodel.py:464-852`) so UNet models
    trained here load back into the PyTorch stack with ``strict=True``.

    The forward map collapses torch's ``output_blocks.{i}.{j}.conv``
    (Upsample) to ``output_blocks_{i}_up``; the torch position ``j`` is
    reconstructed from the param tree itself — it is 2 when the block
    also carries a SpatialTransformer/AttentionBlock (a
    ``output_blocks_{i}_1`` sibling), else 1.
    """
    flat = _flatten(params.get("params", params))
    has_attn = set()
    for path in flat:
        m = re.fullmatch(r"output_blocks_(\d+)_1", path[0])
        if m:
            has_attn.add(m.group(1))
    out = {}
    for path, arr in flat.items():
        parts = list(path)
        leaf = parts.pop()
        top = parts[0]
        # top-level flax module name -> torch module path
        if top == "time_embed_fc1":
            t_top = "time_embed.0"
        elif top == "time_embed_fc2":
            t_top = "time_embed.2"
        elif top == "out_norm":
            t_top = "out.0"
        elif top == "out_conv":
            t_top = "out.2"
        else:
            m_down = re.fullmatch(r"input_blocks_(\d+)_0_down", top)
            m_up = re.fullmatch(r"output_blocks_(\d+)_up", top)
            m_seq = re.fullmatch(
                r"(input_blocks|output_blocks|middle_block)_(\d+)(?:_(\d+))?",
                top)
            if m_down:
                t_top = f"input_blocks.{m_down.group(1)}.0.op"
            elif m_up:
                i = m_up.group(1)
                j = 2 if i in has_attn else 1
                t_top = f"output_blocks.{i}.{j}.conv"
            elif m_seq:
                t_top = f"{m_seq.group(1)}.{m_seq.group(2)}"
                if m_seq.group(3) is not None:
                    t_top += f".{m_seq.group(3)}"
            else:
                t_top = top  # label_emb etc.
        base = ".".join([t_top] + parts[1:])
        # interior renames (inverse of _unet_key_map)
        base = re.sub(r"\bblocks_(\d+)\b", r"transformer_blocks.\1", base)
        base = base.replace(".in_norm", ".in_layers.0")
        base = base.replace(".in_conv", ".in_layers.2")
        base = base.replace(".emb_proj", ".emb_layers.1")
        base = base.replace(".out_norm", ".out_layers.0")
        base = base.replace(".out_conv", ".out_layers.3")
        base = base.replace(".skip", ".skip_connection")
        base = base.replace(".to_out", ".to_out.0")
        base = base.replace(".ff.geglu_proj", ".ff.net.0.proj")
        base = base.replace(".ff.out", ".ff.net.2")
        if leaf == "kernel":
            if arr.ndim == 4:
                t = arr.transpose(3, 2, 0, 1)
            elif arr.ndim == 3:  # Conv1d: [k, I, O] -> [O, I, k]
                t = arr.transpose(2, 1, 0)
            else:
                t = arr.T
            out[f"{base}.weight"] = t
        elif leaf in ("scale", "embedding"):
            out[f"{base}.weight"] = arr
        elif leaf == "bias":
            out[f"{base}.bias"] = arr
        else:  # bare params (none in the UNet family; kept for symmetry)
            out[".".join([base, leaf])] = arr
    return out


def save_torch_state_dict(state_dict: Dict[str, Any], path: str) -> None:
    import torch

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state_dict.items()}, path)

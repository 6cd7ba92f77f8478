"""CLIP text encoder (frozen codec) in Flax + HF weight conversion.

The reference wraps HF ``openai/clip-vit-large-patch14``'s text tower and
returns ``last_hidden_state`` [B, 77, 768] (`/root/reference/libs/clip.py:
38-91`). This is a standalone Flax implementation of that tower (pre-LN
transformer, causal mask, quick-GELU) so text conditioning runs as part of
compiled TPU programs, plus a converter from the HF torch checkpoint.

Tokenization stays on host (it is string processing): the wrapper uses
``transformers.CLIPTokenizer`` when its vocab files are available locally.
``get_word_inds`` maps a word to its token positions for prompt-to-prompt
editing (`libs/clip.py:6-27`).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

CLIP_L14 = dict(  # openai/clip-vit-large-patch14 text tower
    vocab_size=49408,
    hidden_size=768,
    intermediate_size=3072,
    num_layers=12,
    num_heads=12,
    max_length=77,
)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array) -> Array:
        """input_ids [B, L] -> last_hidden_state [B, L, hidden]."""
        b, l = input_ids.shape
        h = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        pos = nn.Embed(self.max_length, self.hidden_size, dtype=self.dtype,
                       name="position_embedding")(jnp.arange(l)[None, :])
        h = h + pos
        # causal mask (CLIP text tower is autoregressive-masked)
        mask = jnp.tril(jnp.ones((l, l), bool))
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
        bias = jnp.where(mask, 0.0, neg)[None, None]

        hd = self.hidden_size // self.num_heads
        for i in range(self.num_layers):
            res = h
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"layers_{i}_ln1")(h)
            q = nn.Dense(self.hidden_size, dtype=self.dtype,
                         name=f"layers_{i}_q")(h)
            k = nn.Dense(self.hidden_size, dtype=self.dtype,
                         name=f"layers_{i}_k")(h)
            v = nn.Dense(self.hidden_size, dtype=self.dtype,
                         name=f"layers_{i}_v")(h)
            q = q.reshape(b, l, self.num_heads, hd).transpose(0, 2, 1, 3)
            k = k.reshape(b, l, self.num_heads, hd).transpose(0, 2, 1, 3)
            v = v.reshape(b, l, self.num_heads, hd).transpose(0, 2, 1, 3)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            s = s * (hd**-0.5) + bias
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
            o = o.transpose(0, 2, 1, 3).reshape(b, l, self.hidden_size)
            h = res + nn.Dense(self.hidden_size, dtype=self.dtype,
                               name=f"layers_{i}_out")(o)
            res = h
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"layers_{i}_ln2")(h)
            h = nn.Dense(self.intermediate_size, dtype=self.dtype,
                         name=f"layers_{i}_fc1")(h)
            h = quick_gelu(h)
            h = res + nn.Dense(self.hidden_size, dtype=self.dtype,
                               name=f"layers_{i}_fc2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="final_ln")(h)


def clip_torch_to_flax(state_dict) -> dict:
    """Convert an HF CLIPTextModel state dict to CLIPTextEncoder params."""
    from .convert import convert_state_dict

    def key_map(base: str):
        b = base
        if b.startswith("text_model."):
            b = b[len("text_model."):]
        b = b.replace("embeddings.token_embedding", "token_embedding")
        b = b.replace("embeddings.position_embedding", "position_embedding")
        b = b.replace("final_layer_norm", "final_ln")
        import re

        m = re.match(r"encoder\.layers\.(\d+)\.(.*)", b)
        if m:
            i, rest = m.groups()
            rest = (rest
                    .replace("self_attn.q_proj", "q")
                    .replace("self_attn.k_proj", "k")
                    .replace("self_attn.v_proj", "v")
                    .replace("self_attn.out_proj", "out")
                    .replace("layer_norm1", "ln1")
                    .replace("layer_norm2", "ln2")
                    .replace("mlp.fc1", "fc1")
                    .replace("mlp.fc2", "fc2"))
            b = f"layers_{i}_{rest}"
        if "position_ids" in b:
            return None
        return tuple(b.split("."))

    return convert_state_dict(
        state_dict, key_map,
        embedding_keys=("token_embedding", "position_embedding"),
    )


def get_word_inds(text: str, word_place, tokenizer) -> np.ndarray:
    """Token positions of a word within the padded 77-token encoding
    (reference `libs/clip.py:6-27`; used to build p2p target ids)."""
    split_text = text.split(" ")
    if isinstance(word_place, str):
        word_place = [i for i, word in enumerate(split_text)
                      if word_place == word]
    elif isinstance(word_place, int):
        word_place = [word_place]
    out = []
    if len(word_place) > 0:
        words_encode = [
            tokenizer.decode([item]).strip("#")
            for item in tokenizer.encode(text)
        ][1:-1]
        cur_len, ptr = 0, 0
        for i, word in enumerate(words_encode):
            cur_len += len(word)
            if ptr in word_place:
                out.append(i + 1)
            if cur_len >= len(split_text[ptr]):
                ptr += 1
                cur_len = 0
    return np.array(out)


class FrozenCLIPEmbedder:
    """Host-side wrapper: text -> [B, 77, 768] context (reference
    `libs/clip.py:38-91`). Requires local HF tokenizer + converted params.
    """

    def __init__(self, params, tokenizer, max_length: int = 77,
                 config: Optional[dict] = None):
        cfg = dict(config or CLIP_L14)
        cfg["max_length"] = max_length
        self.model = CLIPTextEncoder(**cfg)
        self.params = params
        self.tokenizer = tokenizer
        self.max_length = max_length
        self._encode = jax.jit(
            lambda p, ids: self.model.apply(p, ids)
        )

    def tokenize(self, texts: Sequence[str]) -> np.ndarray:
        enc = self.tokenizer(
            list(texts), truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np",
        )
        return enc["input_ids"]

    def encode(self, texts: Sequence[str]) -> Array:
        return self._encode(self.params, jnp.asarray(self.tokenize(texts)))

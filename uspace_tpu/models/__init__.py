"""Denoiser network registry (reference `tools/utils_uvit.py:27-41`)."""

from __future__ import annotations

from typing import Any

from .layers import patchify, timestep_embedding, unpatchify
from .uvit import UViT
from .uvit_t2i import UViTT2I

_REGISTRY = {}


def register_nnet(name: str, cls) -> None:
    _REGISTRY[name] = cls


def get_nnet(name: str, **kwargs) -> Any:
    """Build a denoiser by config name: uvit | uvit_t2i | unet_t2i."""
    if name == "uvit":
        return UViT(**kwargs)
    if name == "uvit_t2i":
        return UViTT2I(**kwargs)
    if name in _REGISTRY:
        return _REGISTRY[name](**kwargs)
    if name == "unet_t2i":  # lazy import: heavy module
        from .unet import UNet

        return UNet(**kwargs)
    raise NotImplementedError(f"unknown nnet {name!r}")


__all__ = [
    "UViT",
    "UViTT2I",
    "get_nnet",
    "register_nnet",
    "patchify",
    "unpatchify",
    "timestep_embedding",
]

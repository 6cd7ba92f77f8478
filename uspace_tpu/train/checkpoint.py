"""Checkpoint/resume via orbax + pretrained-weight import.

The reference writes one ``.pth`` per component into ``{step}.ckpt/`` dirs
and resumes from the max-step dir (`/root/reference/tools/utils_uvit.py:
112-139,211-222`). Here the whole TrainState is one orbax-checkpointed
pytree (async-capable, multi-host safe), with the same
latest-step-resume contract, plus importers for the reference's torch
checkpoints (weight surgery included — utils_uvit.py:140-209).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..codecs.convert import (
    load_torch_checkpoint,
    merge_params,
    uvit_torch_to_flax,
)
from .state import TrainState


class CheckpointManager:
    """step-indexed TrainState checkpoints under ``ckpt_root``."""

    def __init__(self, ckpt_root: str, max_to_keep: Optional[int] = None):
        self.ckpt_root = os.path.abspath(ckpt_root)
        os.makedirs(self.ckpt_root, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_root,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._warned_preemption = False

    def save(self, state: TrainState, step: Optional[int] = None,
             wait: bool = False) -> None:
        step = int(state.step) if step is None else step
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def reached_preemption(self, step: int) -> bool:
        """True when the JAX distributed runtime has flagged an imminent
        preemption (orbax's multihost sync point — every host returns
        the same answer at the same step). False when running without a
        distributed coordinator (single-process, CPU tests).

        Only RuntimeError is swallowed (raised when a multihost run has
        the preemption service disabled), and loudly, once: silently
        returning False there would hide that the operator's
        synchronized-preemption path is dead. orbax itself already
        returns False when no distributed client exists."""
        try:
            return bool(self._mgr.reached_preemption(step))
        except RuntimeError as e:
            if not self._warned_preemption:
                self._warned_preemption = True
                import warnings

                warnings.warn(
                    "reached_preemption unavailable (preemption service "
                    f"disabled under an initialized distributed client?): {e!r}"
                    " — falling back to False; synchronized preemption "
                    "checkpointing will NOT fire.",
                    RuntimeWarning,
                )
            return False

    def restore(self, state_like: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into the structure (and shardings) of ``state_like``."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.ckpt_root}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like)
        )

    def restore_params(self, step: Optional[int] = None, ema: bool = True):
        """Restore only the (EMA) parameter tree, without needing the
        training optimizer's state structure — the loader for dissection
        and export, which must open checkpoints from any optimizer
        configuration."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.ckpt_root}")
        raw = self._mgr.restore(step)  # structure-free restore
        key = "ema_params" if ema else "params"
        if key not in raw:
            raise KeyError(f"checkpoint at step {step} has no {key!r}")
        return raw[key]

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def try_resume(mgr: CheckpointManager, state: TrainState) -> TrainState:
    """Resume from the latest checkpoint if any (reference
    ``TrainState.resume``, utils_uvit.py:211-222)."""
    step = mgr.latest_step()
    if step is None:
        return state
    return mgr.restore(state, step)


# --- pretrained torch-weight initialization (weight surgery) ---------------


def load_pretrained_nnet(
    path: str,
    init_params: Any,
    surgery: Optional[str] = None,
) -> Any:
    """Initialize denoiser params from a reference torch checkpoint.

    surgery:
      - None: strict load (U-ViT family)
      - "nnet_only": drop label_emb + pos_embed (utils_uvit.py:140-155)
      - "mscoco_or_in256": drop pos_embed (utils_uvit.py:156-166)
      - "unet": SD/guided-diffusion UNet checkpoint
      - "unet_remove_attention": UNet, re-initialize cross-attention
        (load_sd_unet_remove_attention, utils_uvit.py:168-209)
    Dropped keys keep their fresh initialization.
    """
    sd = load_torch_checkpoint(path)
    if surgery in ("unet", "unet_remove_attention"):
        from ..codecs.convert import unet_torch_to_flax

        converted = unet_torch_to_flax(
            sd, drop_cross_attention=(surgery == "unet_remove_attention")
        )
        params = dict(init_params)
        params["params"] = merge_params(converted, init_params["params"])
        return params
    drop = ()
    if surgery == "nnet_only":
        drop = ("label_emb", "pos_embed")
    elif surgery == "mscoco_or_in256":
        drop = ("pos_embed",)
    elif surgery is not None:
        raise ValueError(f"unknown surgery {surgery!r}")
    converted = uvit_torch_to_flax(sd, drop=drop)
    params = dict(init_params)
    params["params"] = merge_params(converted, init_params["params"])
    return params

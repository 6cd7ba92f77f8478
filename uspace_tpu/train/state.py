"""Train state, optimizer/LR factories, EMA.

Counterpart of the reference's TrainState + factories
(`/root/reference/tools/utils_uvit.py:50-139`): a single pytree holding
step / params / EMA params / optimizer state, so checkpointing is one
orbax save and the EMA update is a fused on-device lerp inside the jitted
train step (the reference loops over parameters on host, utils_uvit.py:
104-109).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class FusedAdam:
    """Adam/AdamW with hyperparameters exposed for the fused train-step
    update path.

    Duck-types the ``optax.GradientTransformation`` interface by
    delegating to the equivalent optax chain, so anything that only
    calls ``init``/``update`` (and checkpoints of ``opt_state``) is
    bit-identical to the plain chain. ``train.step.make_train_step``
    detects this type and replaces the chain's separate tree passes
    (decay + moments + bias correction + lr + apply + EMA lerp) with
    ONE fused pass per leaf computing (params', mu', nu', ema')
    together — structural single-pass traffic instead of an XLA-fusion
    outcome (measured neutral at the bench shape, where XLA already
    fused the chain; see train/step._fused_adam_ema)."""

    chain: optax.GradientTransformation
    mode: str  # "adam" (L2 folded into grad) | "adamw" (decoupled)
    b1: float
    b2: float
    eps: float
    weight_decay: float
    lr_schedule: Callable

    def init(self, params):
        return self.chain.init(params)

    def update(self, grads, state, params=None):
        return self.chain.update(grads, state, params)


def get_lr_schedule(name: str = "customized", base_lr: float = 1e-4,
                    warmup_steps: int = 0, total_steps: int = 1_000_000):
    """LR schedules: 'customized' = linear warmup then constant
    (utils_uvit.py:81-90); 'cosine' = cosine annealing (:96-99)."""
    if name == "customized":
        if warmup_steps and warmup_steps > 0:
            return lambda step: base_lr * jnp.minimum(step / warmup_steps, 1.0)
        return lambda step: jnp.full_like(jnp.asarray(step, jnp.float32), base_lr)
    if name == "cosine":
        return optax.cosine_decay_schedule(base_lr, decay_steps=total_steps)
    raise NotImplementedError(name)


def get_optimizer(
    name: str = "adam",
    lr_schedule: Callable = None,
    betas=(0.9, 0.999),
    weight_decay: float = 0.0,
    grad_clip: Optional[float] = None,
    eps: float = 1e-8,
) -> "optax.GradientTransformation | FusedAdam":
    """Optimizers matching the reference (utils_uvit.py:50-78):

    - "adam": torch.optim.Adam semantics — L2 weight decay folded into the
      gradient *before* the moment updates (not decoupled).
    - "adamw": decoupled weight decay.

    (The reference's x10-LR "vspace" param group belongs to a dead
    experimental module — `libs/sd/openaimodel.py:433-461` V_Space — and is
    intentionally not replicated.)

    Returns a :class:`FusedAdam` (duck-types init/update via the
    equivalent optax chain; opt_state identical) unless ``grad_clip`` is
    set or ``lr_schedule`` is not callable — callers needing a true
    ``optax.GradientTransformation`` NamedTuple (e.g. to wrap in
    ``optax.MultiSteps``) should use ``FusedAdam.chain``.
    """
    b1, b2 = betas
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if name == "adam":
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    elif name == "adamw":
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
    else:
        raise NotImplementedError(name)
    chain.append(optax.scale_by_learning_rate(lr_schedule or 1e-4))
    tx = optax.chain(*chain)
    if grad_clip is None and callable(lr_schedule or None):
        # expose hyperparameters so the train step can fuse the whole
        # update (clip needs a global-norm barrier first — keep generic)
        return FusedAdam(chain=tx, mode=name, b1=b1, b2=b2, eps=eps,
                         weight_decay=weight_decay, lr_schedule=lr_schedule)
    return tx


class TrainState(struct.PyTreeNode):
    """All mutable training state as one pytree (orbax-checkpointable)."""

    step: Array
    params: Any
    ema_params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        # jitted copies/inits: done eagerly these issue one remote op per
        # parameter leaf, which costs minutes per 0.3B-param model on
        # RPC-per-op backends (the axon TPU tunnel)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            # real copy, not an alias: the train step donates the whole
            # state, and aliased buffers cannot be donated twice
            ema_params=jax.jit(lambda p: jax.tree.map(jnp.copy, p))(params),
            opt_state=jax.jit(tx.init)(params),
        )


def ema_update(params, ema_params, rate: float = 0.9999):
    """ema <- rate * ema + (1 - rate) * params (utils_uvit.py:104-109)."""
    return jax.tree.map(
        lambda e, p: e * rate + (1.0 - rate) * p, ema_params, params
    )

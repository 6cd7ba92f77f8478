"""Multi-host initialization and cross-host collectives.

The reference scales out via ``accelerate launch --multi_gpu`` (NCCL
process group, `/root/reference/README.md:76`). The TPU-native
equivalent: ``jax.distributed.initialize()`` per host (coordinator from
env/args), one global mesh over all chips, per-host input pipelines.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-op on a single process (also when
    already initialized). On TPU pods the arguments auto-detect from the
    environment."""
    if num_processes == 1:
        return
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return  # already initialized
    import os

    # TPU_WORKER_HOSTNAMES only signals multi-host when it lists MORE
    # than one worker: single-chip runtimes (e.g. a tunneled dev chip)
    # legitimately export it with one hostname, and treating that as a
    # cluster would demand a coordinator no single-host launch has
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_host = (coordinator_address is not None
                  or num_processes not in (None, 1)
                  or any(v in os.environ for v in (
                      "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                      "MEGASCALE_COORDINATOR_ADDRESS",
                  ))
                  or len([h for h in hostnames.split(",") if h.strip()]) > 1)
    if not multi_host:
        return  # plain single-host launch: nothing to initialize
    # a genuine multi-host environment must fail FAST on init errors
    # (wrong coordinator, firewall): silently continuing would let every
    # host train an independent model copy into the same workdir
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_allgather(x) -> np.ndarray:
    """Gather per-host arrays to every host (the reference's
    ``accelerator.gather`` for sampled images, tools/utils_uvit.py:277)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return np.asarray(x)
    return np.asarray(multihost_utils.process_allgather(x))


def barrier(name: str = "barrier") -> None:
    """Cross-host sync (reference ``wait_for_everyone``)."""
    from jax.experimental import multihost_utils

    if jax.process_count() > 1:
        multihost_utils.sync_global_devices(name)

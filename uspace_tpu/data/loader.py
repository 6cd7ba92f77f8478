"""Host-side batch loader with background prefetch and per-process sharding.

Replaces the reference's torch DataLoader + worker subprocesses
(`/root/reference/train_lfm.py:62-75`, num_workers=8 fork/spawn). TPU
training wants: per-host index sharding (each process loads only its slice
of the global batch — the multi-host input pattern behind
``jax.make_array_from_process_local_data``), threaded prefetch (feature
files are small .npy reads; threads beat process workers since numpy IO
releases the GIL), and a deterministic epoch shuffle.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, Optional

import numpy as np

from .datasets import Dataset


def _stack(samples) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], str):
            out[k] = vals
        else:
            out[k] = np.stack(vals)
    return out


class DataLoader:
    """Deterministically shuffled, process-sharded, prefetching loader.

    Yields dicts of stacked numpy arrays with leading dim
    ``batch_size`` (the *per-process* batch: global batch //
    process_count, mirroring the reference's
    ``batch_size // accelerator.num_processes`` — train_lfm.py:37-38).
    """

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        assert batch_size >= 1
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count

    def n_batches(self) -> int:
        """Batches every process emits per epoch (constant across
        epochs — depends only on dataset size, so resume can map a
        global step to (epoch, batch) without building indices)."""
        n = len(self.dataset)
        if self.drop_last:
            return n // (self.process_count * self.batch_size)
        longest = -(-n // self.process_count)
        return -(-longest // self.batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + epoch).permutation(n)
        # contiguous per-process shard of the shuffled order
        shard = idx[self.process_index::self.process_count]
        # n_batches must be derived from the GLOBAL count, not the local
        # shard: with n % process_count != 0 shard lengths differ by one,
        # and a per-shard count would let processes roll into the next
        # epoch (and its new permutation) at different times, breaking
        # the disjoint-shard guarantee across hosts
        n_batches = self.n_batches()
        if not self.drop_last:
            longest = -(-n // self.process_count)
            if len(shard) < longest:  # shorter shards wrap (like
                # torch's DistributedSampler) so every process emits the
                # same batch count
                pad = longest - len(shard)
                shard = np.concatenate([shard, shard[:pad]])
        return shard, n_batches

    def epoch(self, epoch: int = 0,
              start_batch: int = 0) -> Iterator[Dict[str, Any]]:
        # announce the epoch for per-epoch deterministic augmentation
        # (caption draws / CFG drops key their rng on (seed, idx, epoch))
        set_fn = getattr(self.dataset, "set_epoch", None)
        if set_fn is not None:
            set_fn(epoch)
        shard, n_batches = self._epoch_indices(epoch)
        if n_batches == 0 or start_batch >= n_batches:
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that aborts if the consumer went away (an
            # abandoned epoch must not leave the producer blocked forever)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(start_batch, n_batches):
                        if stop.is_set():
                            return
                        ids = shard[b * self.batch_size:
                                    (b + 1) * self.batch_size]
                        samples = list(pool.map(self.dataset.__getitem__, ids))
                        if not _put(_stack(samples)):
                            return
            except BaseException as e:  # surface to the consumer, don't hang
                _put(e)
                return
            _put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()

    def __iter__(self):
        return self.epoch(0)

    def infinite(self, start_step: int = 0) -> Iterator[Dict[str, Any]]:
        """Cycle epochs forever with reshuffling (the training loop's
        data generator, reference train_lfm.py:129-137).

        ``start_step`` fast-forwards to the batch a run resumed at step
        N would consume next, by INDEX SLICING (no wasted IO): the first
        epoch yielded is ``N // n_batches`` starting at batch
        ``N % n_batches``, so an interrupted+resumed run sees the exact
        batch sequence of an uninterrupted one (the reference's torch
        DataLoader restarts its sampler from scratch on resume —
        train_lfm.py:129-137 — losing data-order reproducibility)."""
        nb = self.n_batches()
        if nb == 0:
            # dataset smaller than one per-process batch (with drop_last):
            # the cycle below would busy-spin forever yielding nothing —
            # surface the misconfiguration instead
            raise ValueError(
                f"DataLoader yields 0 batches/epoch: len(dataset)="
                f"{len(self.dataset)} < process_count({self.process_count})"
                f" * batch_size({self.batch_size}) with drop_last="
                f"{self.drop_last}")
        epoch, skip = start_step // nb, start_step % nb
        while True:
            yield from self.epoch(epoch, start_batch=skip)
            epoch += 1
            skip = 0

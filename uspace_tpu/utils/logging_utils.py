"""Logging + metrics: absl logger with file handler, JSONL metrics writer,
optional wandb (reference wires wandb+absl inline in the training loops —
`/root/reference/train_lfm.py:44-59`, `tools/utils_uvit.py:10-24`)."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

from absl import logging


def set_logger(level: str = "info", log_file: Optional[str] = None) -> None:
    """absl logging + optional file handler (utils_uvit.py:10-21)."""
    import logging as py_logging

    logging.set_verbosity(level)
    if log_file is not None:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        handler = py_logging.FileHandler(log_file)
        handler.setFormatter(
            py_logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        )
        py_logging.getLogger().addHandler(handler)


def dct2str(dct: Dict[str, Any]) -> str:
    """Compact scalar formatting (utils_uvit.py:23-24)."""

    def fmt(v):
        try:
            return f"{float(v):.6g}"
        except (TypeError, ValueError):
            return str(v)

    return " ".join(f"{k}={fmt(v)}" for k, v in dct.items())


class MetricsWriter:
    """Append-only JSONL metrics (the wandb-independent record); also
    forwards to wandb when enabled and to any registered callback sinks
    (generic experiment-tracker hook — each sink is ``fn(step, dict)``).
    """

    def __init__(self, path: Optional[str] = None, use_wandb: bool = False,
                 wandb_kwargs: Optional[dict] = None, sinks=()):
        self.path = path
        self.sinks = list(sinks)
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                logging.warning("wandb not installed; JSONL metrics only")

    def add_sink(self, fn) -> None:
        self.sinks.append(fn)

    def write(self, step: int, metrics: Dict[str, Any]) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        for fn in self.sinks:
            fn(step, rec)


def cnt_params(params) -> int:
    """Total parameter count (reference utils_uvit.cnt_params)."""
    import jax

    return sum(x.size for x in jax.tree.leaves(params))

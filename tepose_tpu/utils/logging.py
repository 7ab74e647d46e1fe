"""Logging / metric observability.

ref: lib/utils/utils.py:155-200 (logger setup, timestamped experiment dirs,
config snapshot) and the trainer's tensorboard scalar stream
(trainer.py:263-270,380-384,499-500).

Scalars go to (a) the python logger, (b) a JSONL metrics file (always), and
(c) tensorboard when torch's SummaryWriter is importable — JSONL is the
primary record in this environment.
"""

from __future__ import annotations

import json
import logging
import os
import os.path as osp
import time
from typing import Dict, Optional


def create_logger(logdir: str, phase: str = "train") -> logging.Logger:
    os.makedirs(logdir, exist_ok=True)
    log_file = osp.join(logdir, f"{phase}_log.txt")
    logger = logging.getLogger()
    if logger.handlers:
        for h in list(logger.handlers):
            logger.removeHandler(h)
            h.close()  # else old FileHandler fds leak across re-inits
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(message)s",
        handlers=[logging.FileHandler(log_file), logging.StreamHandler()],
    )
    return logger


def prepare_output_dir(cfg, cfg_file: Optional[str] = None) -> str:
    """Timestamped experiment dir + config snapshot (ref: utils.py:185-200)."""
    logtime = time.strftime("%d-%m-%Y_%H-%M-%S")
    logdir = f"{logtime}_{cfg.EXP_NAME}"
    logdir = osp.join(cfg.OUTPUT_DIR, logdir)
    os.makedirs(logdir, exist_ok=True)
    cfg.LOGDIR = logdir
    with open(osp.join(logdir, "config.yaml"), "w") as f:
        f.write(cfg.dump())
    return logdir


class MetricWriter:
    """Scalar sink: JSONL always; tensorboard when available."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(osp.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=logdir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, global_step: int) -> None:
        self._f.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(global_step),
             "time": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, global_step)

    def add_scalars(self, metrics: Dict[str, float], step: int,
                    prefix: str = "") -> None:
        for k, v in metrics.items():
            self.add_scalar(f"{prefix}{k}", v, step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class AverageMeter:
    """ref: utils.py:171-182."""

    def __init__(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def import_class(name: str):
    """Dotted-path import (ref: utils.py:203-208)."""
    import importlib

    module, cls = name.rsplit(".", 1)
    return getattr(importlib.import_module(module), cls)


def move_dict_to_device(d, device=None):
    """Place every array value on `device` (ref: utils.py:48-54)."""
    import jax
    import jax.numpy as jnp

    for k, v in d.items():
        if hasattr(v, "shape"):
            d[k] = (jax.device_put(jnp.asarray(v), device)
                    if device is not None else jnp.asarray(v))
    return d

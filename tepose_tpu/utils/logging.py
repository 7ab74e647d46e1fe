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


def _is_primary() -> bool:
    """Artifact-writer gate for the multi-process runtime. Kept lazy — the
    logging module must import without jax."""
    try:
        from tepose_tpu.parallel import distributed

        return distributed.is_primary()
    except Exception:
        return True


def create_logger(logdir: str, phase: str = "train") -> logging.Logger:
    logger = logging.getLogger()
    if logger.handlers:
        for h in list(logger.handlers):
            logger.removeHandler(h)
            h.close()  # else old FileHandler fds leak across re-inits
    handlers = [logging.StreamHandler()]
    # multi-process: only the primary owns the (shared-filesystem) log file;
    # other processes keep console logging, prefixed by process id
    fmt = "%(asctime)s %(message)s"
    if _is_primary():
        os.makedirs(logdir, exist_ok=True)
        handlers.insert(0, logging.FileHandler(
            osp.join(logdir, f"{phase}_log.txt")))
    else:
        from tepose_tpu.parallel import distributed

        fmt = f"%(asctime)s [p{distributed.process_index()}] %(message)s"
    logging.basicConfig(level=logging.INFO, format=fmt, handlers=handlers)
    return logger


def prepare_output_dir(cfg, cfg_file: Optional[str] = None) -> str:
    """Timestamped experiment dir + config snapshot (ref: utils.py:185-200).

    Multi-process: the primary picks the timestamped name and broadcasts it
    so every process agrees on ONE logdir (checkpoint rollback/resume read
    the primary's files over the shared filesystem); only the primary
    writes the config snapshot."""
    logtime = time.strftime("%d-%m-%Y_%H-%M-%S")
    logdir = f"{logtime}_{cfg.EXP_NAME}"
    logdir = osp.join(cfg.OUTPUT_DIR, logdir)
    try:
        from tepose_tpu.parallel import distributed

        if distributed.process_count() > 1:
            logdir = distributed.broadcast_str(logdir)
    except Exception:
        pass
    cfg.LOGDIR = logdir
    if _is_primary():
        os.makedirs(logdir, exist_ok=True)
        with open(osp.join(logdir, "config.yaml"), "w") as f:
            f.write(cfg.dump())
    return logdir


class MetricWriter:
    """Scalar sink: JSONL always; tensorboard when available.

    Multi-process: metrics are replicated (GSPMD reductions make them
    identical on every process), so only the primary writes — concurrent
    appends to one shared metrics.jsonl would interleave corruptly."""

    def __init__(self, logdir: str):
        self._f = None
        self._tb = None
        if not _is_primary():
            return
        os.makedirs(logdir, exist_ok=True)
        self._f = open(osp.join(logdir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=logdir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, global_step: int) -> None:
        if self._f is None:
            return
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
        if self._f is not None:
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

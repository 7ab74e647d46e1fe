"""Profiling & failure-detection hooks (SURVEY.md §5 — the reference has
only wall-clock prints; these are the TPU-native upgrades).

  * `trace(logdir)` — context manager around `jax.profiler` for device
    traces viewable in TensorBoard/XProf.
  * `StageTimer` — per-stage wall timing for the streaming pipeline
    (decode/track/crop/features/stream/render), the structured version of
    the reference's demo FPS prints (demo.py:350-355).
  * `NaNGuard` — training failure detection: monitors the loss stream,
    counts consecutive non-finite steps and signals when training should
    halt/rollback (the reference only prints, trainer.py:285-287).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device profile into `logdir` (open with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating wall-clock timers keyed by stage name."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()  # monotonic: NTP steps can't skew totals
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1000.0 * self.totals[k]
                    / max(self.counts[k], 1)}
                for k in self.totals}

    def report(self) -> str:
        return " | ".join(
            f"{k}: {v['total_s']:.2f}s ({v['mean_ms']:.1f}ms x {v['count']})"
            for k, v in sorted(self.summary().items()))


class NaNGuard:
    """Detects persistent non-finite losses and recommends rollback.

    The reference only prints on NaN (trainer.py:285-287); this tracks a
    consecutive-failure budget so the host loop can stop and restore the
    last good checkpoint.
    """

    def __init__(self, patience: int = 3):
        self.patience = patience
        self.consecutive = 0
        self.total = 0
        self.last_good_step: Optional[int] = None

    def check(self, loss: float, step: int) -> bool:
        """Returns True while training may continue."""
        import math

        if math.isfinite(loss):
            self.consecutive = 0
            self.last_good_step = step
            return True
        self.consecutive += 1
        self.total += 1
        return self.consecutive < self.patience

    @property
    def should_rollback(self) -> bool:
        return self.consecutive >= self.patience

"""Validation-only engine (stage-2 model testing).

ref: lib/core/tester.py:40-336 — a validation-only clone of the Trainer,
dead code in the reference (never imported) but part of its inventory. Here
it is a thin live wrapper over train.validate.validate_epoch.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


class Tester:
    """Run trainer-style validation for a pretrained generator."""

    def __init__(self, *, cfg, gen_params, smpl, model_cfg, valid_loader,
                 j_regressor: np.ndarray):
        self.cfg = cfg
        self.gen_params = gen_params
        self.smpl = smpl
        self.model_cfg = model_cfg
        self.valid_loader = valid_loader
        self.j_regressor = j_regressor

    def test(self) -> Dict[str, float]:
        """ref: tester.py:202 (.test()) -> the trainer-eval metric dict."""
        from tepose_tpu.train.validate import validate_epoch

        it = iter(self.valid_loader)
        n = len(self.valid_loader)
        return validate_epoch(
            self.gen_params, self.smpl, self.model_cfg,
            (next(it) for _ in range(n)),
            self.j_regressor, self.model_cfg.seqlen)

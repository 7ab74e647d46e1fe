"""Evaluation: metrics and the batched theta-feedback evaluator (layer L5/L6).

ref: lib/utils/eval_utils.py, evaluate.py.
"""

from tepose_tpu.eval.metrics import (  # noqa: F401
    mpjpe,
    pa_mpjpe,
    accel_error_eval,
    accel_error_masked,
    accel_magnitude_masked,
    vertex_error,
)

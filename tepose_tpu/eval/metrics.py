"""Pose/shape error metrics with the reference's exact conventions.

ref: lib/utils/eval_utils.py. All distances are in the input unit (meters for
SMPL); callers multiply by m2mm=1000 for reporting (ref: evaluate.py:430).

Conventions preserved exactly:
  * pelvis alignment = mean of joints 2 and 3 in the 14-joint common format
    (ref: evaluate.py:424-425); mpii3d uses joint -3 (ref: evaluate.py:421).
  * PA-MPJPE via SVD Procrustes (ops.procrustes).
  * per-video accel metrics exclude window-boundary frames: frames
    [seqlen-1, vidlen-2) for accel, [seqlen-1, vidlen-4) for accel error,
    normalised by sum(vidlen) - n*(seqlen+1) and - n*(seqlen+3) respectively
    (ref: eval_utils.py:53-107).
  * flat eval accel error is the per-frame second difference norm
    (ref: eval_utils.py:110-138).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from tepose_tpu.ops.procrustes import batch_similarity_transform


def align_pelvis(joints: jnp.ndarray, left: int = 2,
                 right: int = 3) -> jnp.ndarray:
    """Subtract the mid-hip from every joint. joints (..., K, 3)."""
    pelvis = (joints[..., left, :] + joints[..., right, :]) / 2.0
    return joints - pelvis[..., None, :]


def mpjpe(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-frame mean-per-joint position error. (N, K, 3) -> (N,)."""
    return jnp.sqrt(((pred - target) ** 2).sum(-1)).mean(-1)


def pa_mpjpe(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Procrustes-aligned MPJPE. (N, K, 3) -> (N,)."""
    aligned = batch_similarity_transform(pred, target)
    return jnp.sqrt(((aligned - target) ** 2).sum(-1)).mean(-1)


def vertex_error(pred_verts: jnp.ndarray,
                 target_verts: jnp.ndarray) -> jnp.ndarray:
    """MPVPE over the mesh surface. (N, V, 3) -> (N,).

    ref: eval_utils.py:141-175 — the caller rebuilds target_verts through SMPL
    from the GT theta (see evaluator.compute_target_verts).
    """
    return jnp.sqrt(((pred_verts - target_verts) ** 2).sum(-1)).mean(-1)


def accel_error_eval(pred: np.ndarray, target: np.ndarray,
                     vis: Optional[np.ndarray] = None) -> np.ndarray:
    """Flat per-frame acceleration error: || d2 pred - d2 target ||.

    (N, K, 3) -> (N-2,). ref: eval_utils.py:110-138 (compute_error_accel_eval).
    """
    accel_gt = target[:-2] - 2 * target[1:-1] + target[2:]
    accel_pred = pred[:-2] - 2 * pred[1:-1] + pred[2:]
    normed = np.linalg.norm(accel_pred - accel_gt, axis=2)
    if vis is not None:
        invis = ~vis
        new_invis = invis | np.roll(invis, -1) | np.roll(invis, -2)
        normed = normed[~new_invis[:-2]]
    return normed.mean(axis=1)


def accel_magnitude_masked(joints: np.ndarray, vidlen_each: np.ndarray,
                           seqlen: int) -> float:
    """Mean accel magnitude over the valid region of padded videos.

    joints (B, T, K, 3) padded to T frames; vidlen_each (B,) true lengths.
    Sums ||d2||-per-frame over frames [seqlen-1, vidlen-2) of each video and
    divides by sum(vidlen) - B*(seqlen+1). ref: eval_utils.py:53-70.
    """
    vel = joints[:, 1:] - joints[:, :-1]
    acc = vel[:, 1:] - vel[:, :-1]
    normed = np.mean(np.linalg.norm(acc, axis=3), axis=2)  # (B, T-2)
    total = 0.0
    for i in range(normed.shape[0]):
        total += np.sum(normed[i, seqlen - 1:int(vidlen_each[i]) - 2])
    denom = np.sum(vidlen_each) - vidlen_each.shape[0] * (seqlen + 1) + 1e-8
    return float(total / denom)


def accel_error_masked(pred: np.ndarray, target: np.ndarray,
                       vidlen_each: np.ndarray, seqlen: int) -> float:
    """Mean accel error over the valid region of padded videos.

    Same normalisation quirks as the reference: frames
    [seqlen-1, vidlen-4), denominator sum(vidlen) - B*(seqlen+3).
    ref: eval_utils.py:73-107.
    """
    accel_gt = target[:, :-2] - 2 * target[:, 1:-1] + target[:, 2:]
    accel_pred = pred[:, :-2] - 2 * pred[:, 1:-1] + pred[:, 2:]
    normed = np.mean(np.linalg.norm(accel_pred - accel_gt, axis=3), axis=2)
    total = 0.0
    for i in range(normed.shape[0]):
        total += np.sum(normed[i, seqlen - 1:int(vidlen_each[i]) - 4])
    denom = np.sum(vidlen_each) - vidlen_each.shape[0] * (seqlen + 3) + 1e-8
    return float(total / denom)

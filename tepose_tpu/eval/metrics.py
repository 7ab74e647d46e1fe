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


def host_joint_errors(pred: np.ndarray, target: np.ndarray):
    """(mpjpe, pa_mpjpe) per frame, computed eagerly ON THE HOST CPU.

    The per-video aggregation loops (EvalAccumulator.add_video,
    train/validate.py) call this once per video with small (T, K, 3)
    arrays; letting the eager ops land on the default device would
    serialize tiny dispatches — and an SVD — against the remote TPU
    (CLAUDE.md link notes; TPU SVD is also slower/less accurate than
    LAPACK, see ops/procrustes.py). The reference computes these on
    host torch tensors too (ref: evaluate.py:417-430).
    """
    import jax

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        errs = np.asarray(mpjpe(jnp.asarray(pred), jnp.asarray(target)))
        errs_pa = np.asarray(
            pa_mpjpe(jnp.asarray(pred), jnp.asarray(target)))
    return errs, errs_pa


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


def plot_accel(joints_pred: np.ndarray, joints_gt: np.ndarray, out_dir: str,
               name: str = "") -> str:
    """Save an acceleration-error-over-time plot (the --plot flag).

    ref: eval_utils.py:10-50 (plot_accel). joints (T, K, 3); returns the
    saved figure path.
    """
    import os

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    accel_err = accel_error_eval(np.asarray(joints_pred),
                                 np.asarray(joints_gt)) * 1000.0
    t = np.arange(len(accel_err))
    plt.figure(figsize=(15, 8))
    plt.plot(t, accel_err, label="TePose (ours)", color="#FF7F0E")
    plt.xlabel("time step", fontsize=10)
    plt.ylabel("acceleration error ($mm/s^2$)", fontsize=10)
    plt.tick_params(axis="x", which="both", bottom=False, top=False,
                    labelbottom=False)
    plt.xlim(-10, len(accel_err) + 10)
    plt.ylim(bottom=-3)
    plot_dir = os.path.join(out_dir, "plot")
    os.makedirs(plot_dir, exist_ok=True)
    path = os.path.join(plot_dir, f"tepose_accel_pred_error_{name}.png")
    plt.savefig(path, bbox_inches="tight")
    plt.close()
    np.save(os.path.join(plot_dir, f"tepose_accel_pred_{name}.npy"),
            accel_err)
    return path

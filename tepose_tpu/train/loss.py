"""TePose training loss: keypoint/SMPL supervision + LSGAN motion prior.

ref: lib/core/loss.py:32-252 (TePoseLoss, batch_encoder_disc_l2_loss,
batch_adv_disc_l2_loss).

XLA needs static shapes, so the reference's boolean-index row filtering
(`pred_theta[w_smpl]`, `pred_motion[...][~w_smpl[::2]]`, and the trainer's
window-validity row drop) is re-expressed as masked means: every reduction is
sum(x * rowmask) / (count(rowmask) * per_row_elems), which is numerically
identical to dropping the rows. The discriminator's BatchNorm receives the
same row mask so its batch statistics also match the filtered-batch semantics
(see gcn.bn_apply's masked path).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from tepose_tpu.ops.geometry import batch_rodrigues


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """ref: configs/repr_*.yaml LOSS.* (train.py:51-58)."""

    kp_2d: float = 300.0
    kp_3d: float = 300.0
    pose: float = 60.0
    shape: float = 0.06
    d_motion: float = 0.5


def _masked_row_mean(err: jnp.ndarray, row_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over rows selected by `row_mask`, matching `err[mask].mean()`.

    err (N, ...) float; row_mask (N,) float/bool. Returns a scalar; 0 when the
    mask is empty (the reference skips the term then).
    """
    m = row_mask.astype(err.dtype)
    per_row = err.reshape(err.shape[0], -1).mean(axis=1)
    count = m.sum()
    return jnp.where(count > 0, (per_row * m).sum() / jnp.maximum(count, 1.0),
                     0.0)


def keypoint_2d_loss(pred_2d: jnp.ndarray, gt_2d: jnp.ndarray,
                     row_mask: jnp.ndarray, openpose_weight: float = 1.0,
                     gt_weight: float = 1.0) -> jnp.ndarray:
    """Confidence-weighted 2D MSE (ref: loss.py:182-195).

    pred (N, 49, 2); gt (N, 49, 3) with confidence in channel 2; joints <25
    are OpenPose-format, >=25 GT-format, each with its own weight.
    """
    conf = gt_2d[..., 2:3]
    w = jnp.concatenate(
        [jnp.full((25,), openpose_weight), jnp.full((24,), gt_weight)]
    )[None, :, None]
    err = conf * w * (pred_2d - gt_2d[..., :2]) ** 2
    return _masked_row_mean(err, row_mask)


def keypoint_3d_loss(pred_3d: jnp.ndarray, gt_3d: jnp.ndarray,
                     row_mask: jnp.ndarray) -> jnp.ndarray:
    """Pelvis-aligned 3D MSE on joints 25:39 (ref: loss.py:197-219).

    pred/gt (N, 49, 3); rows weighted by w_3d & validity.
    """
    pred = pred_3d[:, 25:39]
    gt = gt_3d[:, 25:39]
    gt_pelvis = (gt[:, 2] + gt[:, 3]) / 2.0
    pred_pelvis = (pred[:, 2] + pred[:, 3]) / 2.0
    err = ((pred - pred_pelvis[:, None]) - (gt - gt_pelvis[:, None])) ** 2
    return _masked_row_mean(err, row_mask)


def smpl_losses(pred_pose_aa: jnp.ndarray, pred_betas: jnp.ndarray,
                gt_pose_aa: jnp.ndarray, gt_betas: jnp.ndarray,
                row_mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotation-matrix MSE on the 72-dim pose + MSE on betas
    (ref: loss.py:221-232), rows weighted by w_smpl & validity."""
    N = pred_pose_aa.shape[0]
    pred_rm = batch_rodrigues(pred_pose_aa.reshape(N, 24, 3))
    gt_rm = batch_rodrigues(gt_pose_aa.reshape(N, 24, 3))
    loss_pose = _masked_row_mean((pred_rm - gt_rm) ** 2, row_mask)
    loss_shape = _masked_row_mean((pred_betas - gt_betas) ** 2, row_mask)
    return loss_pose, loss_shape


def encoder_disc_l2_loss(disc_value: jnp.ndarray,
                         row_mask: jnp.ndarray) -> jnp.ndarray:
    """Generator-side LSGAN loss sum((D-1)^2)/k (ref: loss.py:235-241)."""
    m = row_mask.astype(disc_value.dtype)
    k = jnp.maximum(m.sum(), 1.0)
    return jnp.where(m.sum() > 0,
                     (((disc_value - 1.0) ** 2) * m).sum() / k, 0.0)


def adv_disc_l2_loss(real_value: jnp.ndarray, fake_value: jnp.ndarray,
                     real_mask: jnp.ndarray, fake_mask: jnp.ndarray):
    """Discriminator-side LSGAN losses (ref: loss.py:244-252).

    Returns (loss_real, loss_fake, total).
    """
    mr = real_mask.astype(real_value.dtype)
    mf = fake_mask.astype(fake_value.dtype)
    ka = jnp.maximum(mr.sum(), 1.0)
    kb = jnp.maximum(mf.sum(), 1.0)
    la = (((real_value - 1.0) ** 2) * mr).sum() / ka
    lb = ((fake_value ** 2) * mf).sum() / kb
    la = jnp.where(mr.sum() > 0, la, 0.0)
    lb = jnp.where(mf.sum() > 0, lb, 0.0)
    return la, lb, la + lb


def encoder_disc_wasserstein_loss(disc_value: jnp.ndarray,
                                  row_mask: jnp.ndarray) -> jnp.ndarray:
    """Generator-side Wasserstein loss -sum(D)/k (ref: loss.py:255-261).

    Defined-but-unused in the reference (TePoseLoss always uses the LSGAN
    terms); kept for full loss-surface parity, in the same row-masked form
    as `encoder_disc_l2_loss`.
    """
    m = row_mask.astype(disc_value.dtype)
    k = jnp.maximum(m.sum(), 1.0)
    return jnp.where(m.sum() > 0, -(disc_value * m).sum() / k, 0.0)


def adv_disc_wasserstein_loss(real_value: jnp.ndarray,
                              fake_value: jnp.ndarray,
                              real_mask: jnp.ndarray,
                              fake_mask: jnp.ndarray):
    """Discriminator-side Wasserstein losses (ref: loss.py:264-274).

    Returns (loss_real, loss_fake, total); unused by the reference's
    TePoseLoss, mirrored row-masked for surface parity.
    """
    mr = real_mask.astype(real_value.dtype)
    mf = fake_mask.astype(fake_value.dtype)
    ka = jnp.maximum(mr.sum(), 1.0)
    kb = jnp.maximum(mf.sum(), 1.0)
    la = jnp.where(mr.sum() > 0, -(real_value * mr).sum() / ka, 0.0)
    lb = jnp.where(mf.sum() > 0, (fake_value * mf).sum() / kb, 0.0)
    return la, lb, la + lb


def smooth_pose_loss(pred_theta: jnp.ndarray,
                     row_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """|mean(temporal pose diffs)| (ref: loss.py:278-281, defined-but-unused).

    pred_theta (N, T, 85); note the reference takes the abs of the MEAN
    (a signed-drift penalty), not the mean of abs — reproduced exactly.
    """
    diff = pred_theta[:, 1:, 3:75] - pred_theta[:, :-1, 3:75]
    if row_mask is None:
        return jnp.abs(diff.mean())
    return jnp.abs(_masked_row_mean(diff, row_mask))


def smooth_shape_loss(pred_theta: jnp.ndarray,
                      row_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """|mean(temporal shape diffs)| (ref: loss.py:284-287, defined-but-unused)."""
    diff = pred_theta[:, 1:, 75:] - pred_theta[:, :-1, 75:]
    if row_mask is None:
        return jnp.abs(diff.mean())
    return jnp.abs(_masked_row_mean(diff, row_mask))


def tepose_loss(
    preds: Dict[str, jnp.ndarray],
    *,
    kp_2d_gt: jnp.ndarray,
    kp_3d_gt: jnp.ndarray,
    theta_gt: jnp.ndarray,
    w_3d: jnp.ndarray,
    w_smpl: jnp.ndarray,
    valid: jnp.ndarray,
    n_2d: int,
    prev_thetas: jnp.ndarray,
    real_motion: jnp.ndarray,
    disc_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    weights: LossWeights = LossWeights(),
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full generator + discriminator loss for one window step.

    Batch layout follows the trainer (ref: trainer.py:188-232): the first
    `n_2d` rows are 2D-dataset samples, the rest 3D-dataset samples; the model
    emits 2 encoder-branch repeats per row.

    Args:
      preds: tepose_apply train output, each (B, 2, ...), B = n_2d + n_3d.
      kp_2d_gt: (B, 2, 49, 3) last-frame 2D keypoints+conf (repeated x2).
      kp_3d_gt: (n_3d, 2, 49, 3) last-frame 3D joints.
      theta_gt: (n_3d, 2, 85) GT theta.
      w_3d, w_smpl: (n_3d,) supervision masks (per sample).
      valid: (B,) window-validity mask (j < vidlen - seqlen + 1).
      prev_thetas: (B, seqlen-1, 85) theta feedback fed to this window
        (detached by the caller).
      real_motion: (B, seqlen, 85) AMASS real motion batch.
      disc_fn: row-masked discriminator: (x (N,T,72), mask (N,)) -> (N,).

    Returns (gen_loss, motion_disc_loss, loss_dict).
    """
    B = kp_2d_gt.shape[0]
    n_3d = B - n_2d
    reduce = lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

    valid2 = jnp.repeat(valid, 2)           # (2B,) row expand over branches
    valid2_3d = jnp.repeat(valid[n_2d:], 2)
    w_3d2 = jnp.repeat(w_3d.astype(bool), 2)
    w_smpl2 = jnp.repeat(w_smpl.astype(bool), 2)

    pred_j2d = reduce(preds["kp_2d"])               # (2B, 49, 2)
    pred_j3d = reduce(preds["kp_3d"][n_2d:])        # (2*n_3d, 49, 3)
    pred_theta = reduce(preds["theta"][n_2d:])      # (2*n_3d, 85)

    real_2d = reduce(kp_2d_gt)
    real_3d = reduce(kp_3d_gt)
    gt_theta = reduce(theta_gt)

    loss_kp_2d = keypoint_2d_loss(pred_j2d, real_2d, valid2) * weights.kp_2d
    loss_kp_3d = keypoint_3d_loss(pred_j3d, real_3d,
                                  w_3d2 & (valid2_3d > 0)) * weights.kp_3d

    smpl_mask = w_smpl2 & (valid2_3d > 0)
    loss_pose, loss_shape = smpl_losses(
        pred_theta[:, 3:75], pred_theta[:, 75:],
        gt_theta[:, 3:75], gt_theta[:, 75:], smpl_mask)
    loss_pose = loss_pose * weights.pose
    loss_shape = loss_shape * weights.shape

    # --- adversarial motion prior (ref: loss.py:132-154) ------------------
    # fake motion = previous thetas + mean of the 2 predicted branches
    mean_theta = preds["theta"].mean(axis=1)               # (B, 85)
    pred_motion = jnp.concatenate(
        [prev_thetas, mean_theta[:, None, :]], axis=1)     # (B, S, 85)
    # rows entering the GAN: 2D samples + 3D samples without GT SMPL
    no_smpl_3d = ~w_smpl.astype(bool)
    motion_mask = jnp.concatenate(
        [jnp.ones((n_2d,), bool), no_smpl_3d]) & (valid > 0)

    disc_gen = disc_fn(pred_motion[:, :, 3:75], motion_mask)
    e_m_disc_loss = encoder_disc_l2_loss(disc_gen, motion_mask) \
        * weights.d_motion

    fake_motion = jax.lax.stop_gradient(pred_motion)
    disc_fake = disc_fn(fake_motion[:, :, 3:75], motion_mask)
    disc_real = disc_fn(real_motion[:, :, 3:75], motion_mask)
    d_real, d_fake, d_loss = adv_disc_l2_loss(
        disc_real, disc_fake, motion_mask, motion_mask)

    loss_dict = {
        "loss_kp_2d": loss_kp_2d,
        "loss_kp_3d": loss_kp_3d,
        "loss_shape": loss_shape,
        "loss_pose": loss_pose,
        "e_m_disc_loss": e_m_disc_loss,
        "d_m_disc_real": d_real * weights.d_motion,
        "d_m_disc_fake": d_fake * weights.d_motion,
        "d_m_disc_loss": d_loss * weights.d_motion,
    }

    gen_loss = (loss_kp_2d + loss_kp_3d + loss_shape + loss_pose
                + e_m_disc_loss)
    motion_dis_loss = d_loss * weights.d_motion
    return gen_loss, motion_dis_loss, loss_dict

"""Temporal SMPLify: gradient-based refinement of SMPL fits to 2D keypoints.

ref: lib/utils/demo_utils.py:89-165 (`smplify_runner`) — the reference's
`--run_smplify` hook references an undefined `TemporalSMPLify` class and is
broken/vestigial (SURVEY.md §2.5). This is a working TPU-native
implementation: the whole optimisation (Adam over 6d pose, betas, cam)
compiles into one jitted `lax.fori_loop`, batched over the frames of a
tracklet, with the SMPLify-style objective:

  conf-weighted 2D reprojection
  + shape prior ||betas||^2
  + temporal smoothness prior over consecutive frames' pose and camera
  + elbow/knee bending-direction angle prior (SMPLify eq. 10 style)

(The GMM pose prior of classic SMPLify needs its license-gated mixture file
and is omitted; the temporal prior does the regularising work here.)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from tepose_tpu.models.regressor import projection
from tepose_tpu.models.smpl import SmplModel, smpl_forward
from tepose_tpu.ops.geometry import (
    rot6d_to_rotmat, rotmat_to_rot6d, rotmat_to_angle_axis)


@dataclasses.dataclass(frozen=True)
class SmplifyConfig:
    num_iters: int = 60
    lr: float = 0.02
    kp_weight: float = 1.0
    shape_prior_weight: float = 1e-3
    smooth_pose_weight: float = 1.0
    smooth_cam_weight: float = 0.1
    angle_prior_weight: float = 1e-2


# SMPL joints whose bending direction is anatomically constrained
# (left/right knee, left/right elbow) and the sign of the natural bend.
_ANGLE_PRIOR_JOINTS = (4, 5, 18, 19)
_ANGLE_PRIOR_SIGNS = (1.0, -1.0, -1.0, 1.0)


def _angle_prior(pose_aa: jnp.ndarray) -> jnp.ndarray:
    """Penalise unnatural knee/elbow hyper-extension (SMPLify-style)."""
    terms = []
    for j, s in zip(_ANGLE_PRIOR_JOINTS, _ANGLE_PRIOR_SIGNS):
        # knees bend about x, elbows about y; use the dominant axis component
        axis = 0 if j in (4, 5) else 1
        terms.append(jnp.exp(pose_aa[:, j, axis] * s) ** 2)
    return jnp.stack(terms, axis=1).sum(-1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def smplify_refine(
    smpl: SmplModel,
    init_rotmat: jnp.ndarray,     # (T, 24, 3, 3)
    init_betas: jnp.ndarray,      # (T, 10)
    init_cam: jnp.ndarray,        # (T, 3)
    kp_2d: jnp.ndarray,           # (T, 49, 3) normalised [-1,1] + confidence
    cfg: SmplifyConfig = SmplifyConfig(),
) -> Dict[str, jnp.ndarray]:
    """Refine a tracklet's SMPL fits against its 2D keypoints.

    Returns {"theta", "verts", "kp_3d", "kp_2d", "rotmat", "losses"} with the
    same conventions as the regressor output; `losses` is the per-iteration
    objective trace (for convergence monitoring).
    """
    params0 = {
        "pose6d": rotmat_to_rot6d(init_rotmat),   # (T, 24, 6)
        "betas": init_betas,
        "cam": init_cam,
    }
    conf = kp_2d[..., 2:]
    target = kp_2d[..., :2]

    def objective(p):
        T = p["pose6d"].shape[0]
        rotmat = rot6d_to_rotmat(p["pose6d"].reshape(-1, 6)).reshape(
            T, 24, 3, 3)
        out = smpl_forward(smpl, p["betas"], rotmat)
        pred2d = projection(out["joints49"], p["cam"])
        reproj = (conf * (pred2d - target) ** 2).sum((1, 2))

        pose_aa = rotmat_to_angle_axis(rotmat.reshape(-1, 3, 3)).reshape(
            T, 24, 3)
        shape_prior = (p["betas"] ** 2).sum(-1)
        smooth_pose = jnp.concatenate(
            [jnp.zeros((1,)),
             ((p["pose6d"][1:] - p["pose6d"][:-1]) ** 2).sum((1, 2))])
        smooth_cam = jnp.concatenate(
            [jnp.zeros((1,)), ((p["cam"][1:] - p["cam"][:-1]) ** 2).sum(-1)])
        angle = _angle_prior(pose_aa)

        total = (cfg.kp_weight * reproj
                 + cfg.shape_prior_weight * shape_prior
                 + cfg.smooth_pose_weight * smooth_pose
                 + cfg.smooth_cam_weight * smooth_cam
                 + cfg.angle_prior_weight * angle)
        return total.sum()

    tx = optax.adam(cfg.lr)
    opt0 = tx.init(params0)
    grad_fn = jax.value_and_grad(objective)

    def step(_, state):
        p, opt, losses, i = state
        loss, g = grad_fn(p)
        updates, opt = tx.update(g, opt, p)
        p = optax.apply_updates(p, updates)
        return p, opt, losses.at[i].set(loss), i + 1

    losses0 = jnp.zeros((cfg.num_iters,))
    p, _, losses, _ = jax.lax.fori_loop(
        0, cfg.num_iters, step, (params0, opt0, losses0, 0))

    T = p["pose6d"].shape[0]
    rotmat = rot6d_to_rotmat(p["pose6d"].reshape(-1, 6)).reshape(T, 24, 3, 3)
    out = smpl_forward(smpl, p["betas"], rotmat)
    pose_aa = rotmat_to_angle_axis(rotmat.reshape(-1, 3, 3)).reshape(T, 72)
    return {
        "theta": jnp.concatenate([p["cam"], pose_aa, p["betas"]], axis=1),
        "verts": out["verts"],
        "kp_3d": out["joints49"],
        "kp_2d": projection(out["joints49"], p["cam"]),
        "rotmat": rotmat,
        "losses": losses,
    }

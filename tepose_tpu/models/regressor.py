"""Iterative-error-feedback SMPL regressor + weak-perspective projection.

ref: lib/models/spin.py:209-291 (Regressor), spin.py:307-351 (projection /
perspective_projection). The 3 IEF iterations are unrolled at trace time: each
is two 1024-wide dense layers plus three small heads, all MXU matmuls.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tepose_tpu.models import layers as L
from tepose_tpu.models.smpl import (
    SmplModel,
    smpl_forward,
    smpl_joints_reduced,
    regress_h36m_joints,
    H36M_TO_J14,
)
from tepose_tpu.ops.geometry import rot6d_to_rotmat, rotmat_to_angle_axis

NPOSE = 24 * 6  # 144
FEAT_DIM = 2048
THETA_DIM = 85  # cam 3 + pose 72 + shape 10


def regressor_init(rng: jax.Array,
                   mean_params: Optional[dict] = None) -> Dict:
    """Init the IEF regressor params.

    `mean_params` optionally supplies {"pose": (144,), "shape": (10,),
    "cam": (3,)} from smpl_mean_params.npz (ref: spin.py:232-238); without it
    the mean pose is identity 6d rotations, zero shape, cam [0.9, 0, 0].
    """
    ks = jax.random.split(rng, 5)
    params = {
        "fc1": L.linear_init(ks[0], FEAT_DIM + NPOSE + 13, 1024),
        "fc2": L.linear_init(ks[1], 1024, 1024),
        "decpose": L.linear_init(ks[2], 1024, NPOSE, w_scale=0.01),
        "decshape": L.linear_init(ks[3], 1024, 10, w_scale=0.01),
        "deccam": L.linear_init(ks[4], 1024, 3, w_scale=0.01),
    }
    if mean_params is not None:
        init_pose = jnp.asarray(mean_params["pose"], jnp.float32).reshape(-1)
        init_shape = jnp.asarray(mean_params["shape"], jnp.float32).reshape(-1)
        init_cam = jnp.asarray(mean_params["cam"], jnp.float32).reshape(-1)
    else:
        # Identity rotation in 6d: the 6-vector reshapes to (3, 2) in
        # C order (ref: spin.py:263 view(-1,3,2)), so the two basis
        # columns interleave — a1 = elements (0,2,4), a2 = (1,3,5);
        # identity needs a1=(1,0,0), a2=(0,1,0) -> [1,0,0,1,0,0].
        # ([1,0,0,0,1,0] decodes to a det-0 rank-1 matrix.)
        ident6d = jnp.tile(jnp.asarray([1, 0, 0, 1, 0, 0], jnp.float32), 24)
        init_pose = ident6d
        init_shape = jnp.zeros(10, jnp.float32)
        init_cam = jnp.asarray([0.9, 0.0, 0.0], jnp.float32)
    params["init_pose"] = init_pose[None]
    params["init_shape"] = init_shape[None]
    params["init_cam"] = init_cam[None]
    return params


def perspective_projection(points: jnp.ndarray, translation: jnp.ndarray,
                           focal_length: float = 5000.0) -> jnp.ndarray:
    """Pinhole projection with identity rotation and zero camera center.

    ref: spin.py:323-351 — the reference builds K and an identity R; with R=I
    and center=0 this reduces to focal * (p + t).xy / (p + t).z.
    points (B, N, 3), translation (B, 3) -> (B, N, 2).
    """
    p = points + translation[:, None, :]
    xy = p[..., :2] / p[..., 2:3]
    return focal_length * xy


def projection(pred_joints: jnp.ndarray, pred_camera: jnp.ndarray,
               img_size: float = 224.0) -> jnp.ndarray:
    """Weak-perspective camera -> normalised 2D keypoints in [-1, 1].

    ref: spin.py:307-320. cam = (s, tx, ty); depth = 2 * 5000 / (224 s + 1e-9).
    """
    cam_t = jnp.stack(
        [
            pred_camera[:, 1],
            pred_camera[:, 2],
            2.0 * 5000.0 / (img_size * pred_camera[:, 0] + 1e-9),
        ],
        axis=-1,
    )
    kp2d = perspective_projection(pred_joints, cam_t)
    return kp2d / (img_size / 2.0)


def ief_iterations(
    params: Dict,
    x: jnp.ndarray,
    *,
    n_iter: int = 3,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    init_pose: Optional[jnp.ndarray] = None,
    init_shape: Optional[jnp.ndarray] = None,
    init_cam: Optional[jnp.ndarray] = None,
):
    """The unrolled iterative-error-feedback loop (ref: spin.py:253-261).

    Returns (pose6d (B, 144), shape (B, 10), cam (B, 3)).
    """
    B = x.shape[0]
    pred_pose = jnp.broadcast_to(
        params["init_pose"] if init_pose is None else init_pose, (B, NPOSE))
    pred_shape = jnp.broadcast_to(
        params["init_shape"] if init_shape is None else init_shape, (B, 10))
    pred_cam = jnp.broadcast_to(
        params["init_cam"] if init_cam is None else init_cam, (B, 3))

    # CONTRACT: train=True with rng=None keeps the train-mode branch
    # structure but disables dropout (used by the deterministic
    # train-branch parity tests, test_reference_parity.py:153). Real
    # training must pass rng — the reference's nn.Dropout is
    # unconditionally active in train mode (ref: spin.py:224,227) and
    # train/trainer.py threads k_drop accordingly.
    if train and rng is not None:
        drop_keys = list(jax.random.split(rng, 2 * n_iter))
    else:
        drop_keys = [None] * (2 * n_iter)

    for i in range(n_iter):
        xc = jnp.concatenate([x, pred_pose, pred_shape, pred_cam], axis=1)
        xc = L.linear(params["fc1"], xc)
        xc = L.dropout(drop_keys[2 * i], xc, 0.5, train)
        xc = L.linear(params["fc2"], xc)
        xc = L.dropout(drop_keys[2 * i + 1], xc, 0.5, train)
        pred_pose = L.linear(params["decpose"], xc) + pred_pose
        pred_shape = L.linear(params["decshape"], xc) + pred_shape
        pred_cam = L.linear(params["deccam"], xc) + pred_cam
    return pred_pose, pred_shape, pred_cam


def regressor_apply(
    params: Dict,
    smpl: SmplModel,
    x: jnp.ndarray,
    *,
    n_iter: int = 3,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    j_regressor: Optional[jnp.ndarray] = None,
    init_pose: Optional[jnp.ndarray] = None,
    init_shape: Optional[jnp.ndarray] = None,
    init_cam: Optional[jnp.ndarray] = None,
    compute_verts: bool = True,
) -> Dict[str, jnp.ndarray]:
    """IEF regression head. x: (B, 2048) features.

    Returns dict (ref: spin.py:284-290):
      theta  (B, 85)  = [cam(3), pose aa(72), shape(10)]
      verts  (B, V, 3)   — omitted when compute_verts=False (the training
                           loss never reads verts, so the train step uses
                           the vertex-free joint path, smpl_joints_reduced)
      kp_2d  (B, K, 2)   K = 49, or 14 when j_regressor is given (eval)
      kp_3d  (B, K, 3)
      rotmat (B, 24, 3, 3)
    """
    B = x.shape[0]
    pred_pose, pred_shape, pred_cam = ief_iterations(
        params, x, n_iter=n_iter, train=train, rng=rng,
        init_pose=init_pose, init_shape=init_shape, init_cam=init_cam)

    pred_rotmat = rot6d_to_rotmat(pred_pose.reshape(-1, 6)).reshape(
        B, 24, 3, 3)

    if compute_verts:
        smpl_out = smpl_forward(smpl, pred_shape, pred_rotmat)
        pred_vertices = smpl_out["verts"]
        pred_joints = smpl_out["joints49"]
    else:
        pred_vertices = None
        pred_joints = smpl_joints_reduced(smpl, pred_shape, pred_rotmat)

    if (not train) and j_regressor is not None:
        if pred_vertices is None:
            raise ValueError("j_regressor path needs compute_verts=True")
        pred_joints = regress_h36m_joints(
            pred_vertices, j_regressor, subset=np.array(H36M_TO_J14))

    pred_kp2d = projection(pred_joints, pred_cam)

    pose_aa = rotmat_to_angle_axis(pred_rotmat.reshape(-1, 3, 3)).reshape(
        B, 72)

    out = {
        "theta": jnp.concatenate([pred_cam, pose_aa, pred_shape], axis=1),
        "kp_2d": pred_kp2d,
        "kp_3d": pred_joints,
        "rotmat": pred_rotmat,
    }
    if pred_vertices is not None:
        out["verts"] = pred_vertices
    return out

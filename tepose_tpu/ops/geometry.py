"""Rotation-representation conversions, numerically matched to the reference.

All functions are pure jnp code, differentiable (NaN-free gradients via the
safe-where pattern), batch-first, and shape-polymorphic over leading axes where
noted. They reproduce the reference semantics bit-closely in float32:

    ref: lib/utils/geometry.py
      batch_rodrigues            -> geometry.py:22
      quat2mat                   -> geometry.py:37
      rotation_matrix_to_angle_axis -> geometry.py:68
      quaternion_to_angle_axis   -> geometry.py:100
      rotation_matrix_to_quaternion -> geometry.py:153
      rot6d_to_rotmat            -> geometry.py:330
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_div(num, den, eps_mask):
    """num / den, but with den replaced by 1 where `eps_mask` is True.

    Keeps both the value AND the gradient finite where the caller will mask the
    result away with `jnp.where` anyway (the classic safe-where pattern).
    """
    safe_den = jnp.where(eps_mask, jnp.ones_like(den), den)
    return num / safe_den


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) -> 3x3 rotation matrix.

    ref: geometry.py:37 (quat2mat). Input (..., 4), output (..., 3, 3).
    The quaternion is L2-normalised first (torch `norm_quat / norm`).
    """
    norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    q = quat / norm
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]

    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z

    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return rot.reshape(quat.shape[:-1] + (3, 3))


def batch_rodrigues(axisang: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3) via quaternions.

    ref: geometry.py:22. Matches the reference's quirk of computing the angle
    as ||v + 1e-8|| (the epsilon is added to the *vector*, not the norm).
    """
    angle = jnp.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    normalized = axisang / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=-1)
    return quat_to_rotmat(quat)


def rotmat_to_quat(rotmat: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) (w, x, y, z).

    ref: geometry.py:153 (rotation_matrix_to_quaternion); the reference takes a
    (N, 3, 4) homogeneous matrix but only reads the 3x3 block, and works on the
    transpose `rmat_t`. Branch selection uses the same 4-case mask logic,
    expressed as nested wheres so gradients stay finite.
    """
    # The reference transposes, then indexes rmat_t[:, i, j] == rotmat[..., j, i].
    m = jnp.swapaxes(rotmat, -1, -2)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    mask_d2 = m22 < eps
    mask_d0_d1 = m00 > m11
    mask_d0_nd1 = m00 < -m11

    t0 = 1 + m00 - m11 - m22
    q0 = jnp.stack([m12 - m21, t0, m01 + m10, m20 + m02], axis=-1)

    t1 = 1 - m00 + m11 - m22
    q1 = jnp.stack([m20 - m02, m01 + m10, t1, m12 + m21], axis=-1)

    t2 = 1 - m00 - m11 + m22
    q2 = jnp.stack([m01 - m10, m20 + m02, m12 + m21, t2], axis=-1)

    t3 = 1 + m00 + m11 + m22
    q3 = jnp.stack([t3, m12 - m21, m20 - m02, m01 - m10], axis=-1)

    mask_c0 = mask_d2 & mask_d0_d1
    mask_c1 = mask_d2 & ~mask_d0_d1
    mask_c2 = ~mask_d2 & mask_d0_nd1
    mask_c3 = ~mask_d2 & ~mask_d0_nd1

    def pick(a, b, c, d, m0, m1, m2):
        return jnp.where(m0, a, jnp.where(m1, b, jnp.where(m2, c, d)))

    t = pick(t0, t1, t2, t3, mask_c0, mask_c1, mask_c2)
    q = pick(q0, q1, q2, q3,
             mask_c0[..., None], mask_c1[..., None], mask_c2[..., None])
    # q /= sqrt(t_selected); guard t <= 0 (degenerate input) for grad safety.
    bad = t <= 0.0
    q = _safe_div(q, jnp.sqrt(jnp.where(bad, jnp.ones_like(t), t))[..., None], bad[..., None])
    return q * 0.5


def quat_to_angle_axis(quaternion: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) (w, x, y, z) -> axis-angle (..., 3).

    ref: geometry.py:100 (quaternion_to_angle_axis), the ceres-derived kornia
    conversion with the sin==0 -> k=2 fallback.
    """
    q1, q2, q3 = quaternion[..., 1], quaternion[..., 2], quaternion[..., 3]
    sin_sq = q1 * q1 + q2 * q2 + q3 * q3
    zero = sin_sq <= 0.0
    sin_theta = jnp.sqrt(jnp.where(zero, jnp.ones_like(sin_sq), sin_sq))
    cos_theta = quaternion[..., 0]
    two_theta = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta),
    )
    k_pos = two_theta / sin_theta
    k_neg = 2.0 * jnp.ones_like(sin_theta)
    k = jnp.where(zero, k_neg, k_pos)
    return jnp.stack([q1 * k, q2 * k, q3 * k], axis=-1)


def rotmat_to_angle_axis(rotmat: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    ref: geometry.py:68 (rotation_matrix_to_angle_axis), including the
    NaN-zeroing of the output (`aa[torch.isnan(aa)] = 0`).
    """
    quat = rotmat_to_quat(rotmat)
    aa = quat_to_angle_axis(quat)
    return jnp.where(jnp.isnan(aa), jnp.zeros_like(aa), aa)


def _normalize(v: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """torch.nn.functional.normalize semantics: v / max(||v||, eps).

    The sum-of-squares is clamped away from zero before the sqrt so the
    gradient at v == 0 stays finite (the value there is v/eps, which is linear;
    plain jnp.linalg.norm would give a NaN cotangent).
    """
    sumsq = jnp.sum(v * v, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.maximum(sumsq, 1e-30))
    return v / jnp.maximum(n, eps)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation (Zhou et al. CVPR'19) -> rotation matrices.

    ref: geometry.py:330. Input (..., 6) laid out column-major as the reference
    does `x.view(-1, 3, 2)`; output (..., 3, 3) whose *columns* are the
    Gram-Schmidt basis (b1, b2, b3).
    """
    lead = x.shape[:-1]
    x = x.reshape(lead + (3, 2))
    a1 = x[..., 0]
    a2 = x[..., 1]
    b1 = _normalize(a1)
    dot = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2 = _normalize(a2 - dot * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(rotmat: jnp.ndarray) -> jnp.ndarray:
    """Inverse layout of `rot6d_to_rotmat`: take the first two columns."""
    cols = rotmat[..., :2]  # (..., 3, 2)
    return cols.reshape(rotmat.shape[:-2] + (6,))


def estimate_translation_np(S: "np.ndarray", joints_2d: "np.ndarray",
                            joints_conf: "np.ndarray",
                            focal_length: float = 5000.0,
                            img_size: float = 224.0):
    """Weighted-least-squares camera translation from 2D/3D correspondences.

    ref: geometry.py:236-277 (estimate_translation_np) — solves for t such
    that perspective projection of S + t matches joints_2d, weighted by
    sqrt(confidence). Host-side numpy (preprocessing/offline use).
    """
    import numpy as np

    num_joints = S.shape[0]
    f = np.array([focal_length, focal_length])
    center = np.array([img_size / 2.0, img_size / 2.0])

    Z = np.reshape(np.tile(S[:, 2], (2, 1)).T, -1)
    XY = np.reshape(S[:, 0:2], -1)
    O = np.tile(center, num_joints)
    F = np.tile(f, num_joints)
    weight2 = np.reshape(np.tile(np.sqrt(joints_conf), (2, 1)).T, -1)

    Q = np.array([
        F * np.tile(np.array([1, 0]), num_joints),
        F * np.tile(np.array([0, 1]), num_joints),
        O - np.reshape(joints_2d, -1),
    ]).T
    c = (np.reshape(joints_2d, -1) - O) * Z - F * XY

    W = np.diagflat(weight2)
    Q = W @ Q
    c = W @ c
    A = Q.T @ Q
    b = Q.T @ c
    return np.linalg.solve(A, b)


def estimate_translation(S, joints_2d, focal_length: float = 5000.0,
                         img_size: float = 224.0):
    """Batched wrapper using GT joints 25: (ref: geometry.py:280-305)."""
    import numpy as np

    S = np.asarray(S)[:, 25:, :]
    joints_2d = np.asarray(joints_2d)[:, 25:, :]
    conf = joints_2d[:, :, -1]
    pts = joints_2d[:, :, :-1]
    out = np.zeros((S.shape[0], 3), np.float32)
    for i in range(S.shape[0]):
        out[i] = estimate_translation_np(S[i], pts[i], conf[i],
                                         focal_length, img_size)
    return out

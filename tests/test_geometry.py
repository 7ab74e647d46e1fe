"""Golden parity tests for ops.geometry against independent torch oracles.

The oracles below are written directly from the published math (quaternion
algebra, Zhou et al. 6D rotations, kornia/ceres conversions) using torch
primitives — they mirror the semantics of the reference implementation
(lib/utils/geometry.py) without copying it.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tepose_tpu.ops import geometry as G


# ---------------------------------------------------------------- oracles


def torch_quat_to_rotmat(quat):
    q = quat / quat.norm(p=2, dim=1, keepdim=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return torch.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        dim=1,
    ).view(-1, 3, 3)


def torch_rodrigues(axisang):
    angle = torch.norm(axisang + 1e-8, p=2, dim=1, keepdim=True)
    normalized = axisang / angle
    half = angle * 0.5
    quat = torch.cat([torch.cos(half), torch.sin(half) * normalized], dim=1)
    return torch_quat_to_rotmat(quat)


def torch_rot6d_to_rotmat(x):
    x = x.view(-1, 3, 2)
    b1 = F.normalize(x[:, :, 0], dim=1, eps=1e-6)
    dot = torch.sum(b1 * x[:, :, 1], dim=1, keepdim=True)
    b2 = F.normalize(x[:, :, 1] - dot * b1, dim=-1, eps=1e-6)
    b3 = torch.cross(b1, b2, dim=1)
    return torch.stack([b1, b2, b3], dim=-1)


def torch_rotmat_to_quat(rotmat, eps=1e-6):
    """pyquaternion-style 4-branch conversion, operating on the transpose."""
    m = rotmat.transpose(1, 2)
    mask_d2 = m[:, 2, 2] < eps
    mask_d0_d1 = m[:, 0, 0] > m[:, 1, 1]
    mask_d0_nd1 = m[:, 0, 0] < -m[:, 1, 1]

    t0 = 1 + m[:, 0, 0] - m[:, 1, 1] - m[:, 2, 2]
    q0 = torch.stack([m[:, 1, 2] - m[:, 2, 1], t0,
                      m[:, 0, 1] + m[:, 1, 0], m[:, 2, 0] + m[:, 0, 2]], -1)
    t1 = 1 - m[:, 0, 0] + m[:, 1, 1] - m[:, 2, 2]
    q1 = torch.stack([m[:, 2, 0] - m[:, 0, 2], m[:, 0, 1] + m[:, 1, 0],
                      t1, m[:, 1, 2] + m[:, 2, 1]], -1)
    t2 = 1 - m[:, 0, 0] - m[:, 1, 1] + m[:, 2, 2]
    q2 = torch.stack([m[:, 0, 1] - m[:, 1, 0], m[:, 2, 0] + m[:, 0, 2],
                      m[:, 1, 2] + m[:, 2, 1], t2], -1)
    t3 = 1 + m[:, 0, 0] + m[:, 1, 1] + m[:, 2, 2]
    q3 = torch.stack([t3, m[:, 1, 2] - m[:, 2, 1],
                      m[:, 2, 0] - m[:, 0, 2], m[:, 0, 1] - m[:, 1, 0]], -1)

    c0 = (mask_d2 * mask_d0_d1).float().view(-1, 1)
    c1 = (mask_d2 * ~mask_d0_d1).float().view(-1, 1)
    c2 = (~mask_d2 * mask_d0_nd1).float().view(-1, 1)
    c3 = (~mask_d2 * ~mask_d0_nd1).float().view(-1, 1)

    q = q0 * c0 + q1 * c1 + q2 * c2 + q3 * c3
    t = (t0.view(-1, 1) * c0 + t1.view(-1, 1) * c1
         + t2.view(-1, 1) * c2 + t3.view(-1, 1) * c3)
    q = q / torch.sqrt(t)
    return q * 0.5


def torch_quat_to_angle_axis(quaternion):
    q1, q2, q3 = quaternion[..., 1], quaternion[..., 2], quaternion[..., 3]
    sin_sq = q1 * q1 + q2 * q2 + q3 * q3
    sin_theta = torch.sqrt(sin_sq)
    cos_theta = quaternion[..., 0]
    two_theta = 2.0 * torch.where(
        cos_theta < 0.0,
        torch.atan2(-sin_theta, -cos_theta),
        torch.atan2(sin_theta, cos_theta),
    )
    k = torch.where(sin_sq > 0.0, two_theta / sin_theta,
                    2.0 * torch.ones_like(sin_theta))
    return torch.stack([q1 * k, q2 * k, q3 * k], dim=-1)


def torch_rotmat_to_angle_axis(rotmat):
    aa = torch_quat_to_angle_axis(torch_rotmat_to_quat(rotmat))
    aa[torch.isnan(aa)] = 0.0
    return aa


# ---------------------------------------------------------------- helpers


def random_rotmats(rng, n):
    """Random rotation matrices via QR of gaussians (det fixed to +1)."""
    a = rng.randn(n, 3, 3).astype(np.float64)
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=1, axis2=2))
    q = q * d[:, None, :]
    det = np.linalg.det(q)
    q[:, :, 0] *= det[:, None]
    return q.astype(np.float32)


# ---------------------------------------------------------------- tests


def test_quat_to_rotmat(rng):
    quat = rng.randn(64, 4).astype(np.float32)
    ours = np.asarray(G.quat_to_rotmat(jnp.asarray(quat)))
    ref = torch_quat_to_rotmat(torch.from_numpy(quat)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_batch_rodrigues(rng):
    aa = (rng.randn(128, 3) * 1.5).astype(np.float32)
    aa[0] = 0.0  # degenerate: zero rotation
    aa[1] = [np.pi, 0, 0]  # 180 degrees
    ours = np.asarray(G.batch_rodrigues(jnp.asarray(aa)))
    ref = torch_rodrigues(torch.from_numpy(aa)).numpy().reshape(-1, 3, 3)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rot6d_to_rotmat(rng):
    x = rng.randn(64, 144).astype(np.float32)  # 24 joints x 6, as the model emits
    ours = np.asarray(G.rot6d_to_rotmat(jnp.asarray(x.reshape(-1, 6))))
    ref = torch_rot6d_to_rotmat(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # Valid rotations: orthonormal, det + 1
    eye = np.einsum("bij,bkj->bik", ours, ours)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)


def test_rotmat_to_quat_branches(rng):
    mats = random_rotmats(rng, 256)
    # Force coverage of all 4 branch cases with axis-aligned rotations
    from scipy.spatial.transform import Rotation
    extra = Rotation.from_euler(
        "xyz", [[np.pi, 0, 0], [0, np.pi, 0], [0, 0, np.pi], [0, 0, 0],
                [np.pi * 0.999, 0.01, 0]]).as_matrix().astype(np.float32)
    mats = np.concatenate([mats, extra], axis=0)
    ours = np.asarray(G.rotmat_to_quat(jnp.asarray(mats)))
    ref = torch_rotmat_to_quat(torch.from_numpy(mats)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rotmat_to_angle_axis_roundtrip(rng):
    mats = random_rotmats(rng, 256)
    ours = np.asarray(G.rotmat_to_angle_axis(jnp.asarray(mats)))
    ref = torch_rotmat_to_angle_axis(torch.from_numpy(mats)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # Round-trip: aa -> R must reproduce the input rotation
    back = np.asarray(G.batch_rodrigues(jnp.asarray(ours)))
    np.testing.assert_allclose(back, mats, atol=1e-4)


def test_rotmat_to_angle_axis_identity():
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (4, 3, 3)).copy()
    aa = np.asarray(G.rotmat_to_angle_axis(jnp.asarray(eye)))
    assert np.all(np.isfinite(aa))
    np.testing.assert_allclose(aa, 0.0, atol=1e-6)


def test_angle_axis_gradients_finite():
    """The safe-where pattern must keep gradients NaN-free at singularities."""
    import jax

    def loss(m):
        return jnp.sum(G.rotmat_to_angle_axis(m) ** 2)

    eye = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    g = jax.grad(loss)(eye)
    assert np.all(np.isfinite(np.asarray(g)))

    def loss6d(x):
        return jnp.sum(G.rot6d_to_rotmat(x))

    g2 = jax.grad(loss6d)(jnp.zeros((2, 6)))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_rot6d_roundtrip(rng):
    mats = random_rotmats(rng, 64)
    six = np.asarray(G.rotmat_to_rot6d(jnp.asarray(mats)))
    back = np.asarray(G.rot6d_to_rotmat(jnp.asarray(six)))
    np.testing.assert_allclose(back, mats, atol=1e-5)


def test_procrustes_alignment(rng):
    from tepose_tpu.ops.procrustes import batch_similarity_transform

    # Construct S2 = s R S1 + t exactly; alignment must recover it.
    S1 = rng.randn(8, 14, 3).astype(np.float32)
    R = random_rotmats(rng, 8)
    s = rng.uniform(0.5, 2.0, size=(8, 1, 1)).astype(np.float32)
    t = rng.randn(8, 1, 3).astype(np.float32)
    S2 = s * np.einsum("bij,bnj->bni", R, S1) + t

    S1_hat = np.asarray(
        batch_similarity_transform(jnp.asarray(S1), jnp.asarray(S2)))
    np.testing.assert_allclose(S1_hat, S2, atol=1e-4)


def test_procrustes_vs_numpy_oracle(rng):
    """Compare against a plain-numpy Umeyama implementation on noisy clouds."""
    from tepose_tpu.ops.procrustes import batch_similarity_transform

    def numpy_procrustes(S1, S2):
        mu1, mu2 = S1.mean(0), S2.mean(0)
        X1, X2 = S1 - mu1, S2 - mu2
        var1 = (X1 ** 2).sum()
        K = X1.T @ X2
        U, _, Vh = np.linalg.svd(K)
        V = Vh.T
        Z = np.eye(3)
        Z[-1, -1] = np.sign(np.linalg.det(U @ V.T))
        R = V @ Z @ U.T
        scale = np.trace(R @ K) / var1
        t = mu2 - scale * (R @ mu1)
        return scale * S1 @ R.T + t

    S1 = rng.randn(6, 14, 3).astype(np.float32)
    S2 = (S1 + 0.1 * rng.randn(6, 14, 3)).astype(np.float32)
    ours = np.asarray(
        batch_similarity_transform(jnp.asarray(S1), jnp.asarray(S2)))
    for b in range(6):
        np.testing.assert_allclose(ours[b], numpy_procrustes(S1[b], S2[b]),
                                   atol=1e-4)

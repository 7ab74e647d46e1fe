"""Tests for quaternion slerp smoothing and the 1-euro/bbox filters."""

import numpy as np
from scipy.spatial.transform import Rotation

from tepose_tpu.ops import filters as F
from tepose_tpu.ops import quaternion as Q


def test_quaternion_roundtrip(rng):
    for _ in range(20):
        R = Rotation.random(random_state=rng).as_matrix()
        q = Q.quaternion_from_matrix(R)
        back = Q.quaternion_matrix(q)[:3, :3]
        np.testing.assert_allclose(back, R, atol=1e-8)
        # scipy cross-check (scipy uses xyzw order)
        q_ref = Rotation.from_matrix(R).as_quat()  # x,y,z,w
        q_ref = np.array([q_ref[3], q_ref[0], q_ref[1], q_ref[2]])
        assert (np.allclose(q, q_ref, atol=1e-6)
                or np.allclose(q, -q_ref, atol=1e-6))


def test_slerp_endpoints_and_midpoint():
    r0 = Rotation.from_euler("z", 0, degrees=True)
    r1 = Rotation.from_euler("z", 90, degrees=True)
    q0 = Q.quaternion_from_matrix(r0.as_matrix())
    q1 = Q.quaternion_from_matrix(r1.as_matrix())
    np.testing.assert_allclose(Q.quaternion_slerp(q0, q1, 0.0), q0, atol=1e-9)
    np.testing.assert_allclose(Q.quaternion_slerp(q0, q1, 1.0), q1, atol=1e-9)
    mid = Q.quaternion_matrix(Q.quaternion_slerp(q0, q1, 0.5))[:3, :3]
    expected = Rotation.from_euler("z", 45, degrees=True).as_matrix()
    np.testing.assert_allclose(mid, expected, atol=1e-8)


def test_smooth_rotmats_reduces_jitter(rng):
    T, J = 30, 4
    base = Rotation.from_euler(
        "xyz", np.cumsum(rng.randn(T, 3) * 0.02, axis=0)).as_matrix()
    noise = Rotation.from_euler(
        "xyz", rng.randn(T, 3) * 0.1).as_matrix()
    noisy = np.einsum("tij,tjk->tik", base, noise)
    rotmats = np.tile(noisy[:, None], (1, J, 1, 1))
    smoothed = Q.smooth_rotmats_slerp(rotmats, ratio=0.3)
    # still valid rotations
    eye = np.einsum("tjik,tjlk->tjil", smoothed, smoothed)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)

    def jitter(r):
        d = r[2:] - 2 * r[1:-1] + r[:-2]
        return np.abs(d).mean()

    assert jitter(smoothed[:, 0]) < jitter(rotmats[:, 0])


def test_one_euro_filter_smooths(rng):
    t = np.arange(200)
    clean = np.sin(t / 20.0)
    noisy = clean + rng.randn(200) * 0.2
    f = F.OneEuroFilter(0, np.array([noisy[0]]), min_cutoff=0.05, beta=0.0)
    out = [noisy[0]]
    for i in range(1, 200):
        out.append(float(f(i, np.array([noisy[i]]))[0]))
    out = np.asarray(out)
    assert np.abs(np.diff(out)).mean() < np.abs(np.diff(noisy)).mean()


def test_smooth_pose_params_shapes(rng):
    pose = rng.randn(20, 72).astype(np.float64)
    betas = rng.randn(20, 10).astype(np.float64)
    sp, sb = F.smooth_pose_params(pose, betas)
    assert sp.shape == pose.shape and sb.shape == betas.shape
    np.testing.assert_array_equal(sp[0], pose[0])  # first frame unchanged
    # betas pass through UNfiltered: the reference's smooth_pose filters
    # only the pose and feeds raw per-frame betas to SMPL
    # (ref: smooth_pose.py:28-65)
    np.testing.assert_array_equal(sb, betas)
    assert not np.array_equal(sp[1:], pose[1:])  # pose actually filtered


def test_bbox_pipeline(rng):
    T, K = 40, 17
    kps = np.zeros((T, K, 3), np.float32)
    centers = np.stack([100 + np.arange(T) * 2.0,
                        np.full(T, 200.0)], axis=1)
    for t in range(T):
        kps[t, :, :2] = centers[t] + rng.randn(K, 2) * 20
        kps[t, :, 2] = 1.0
    kps[10:13, :, 2] = 0.0   # interior gap -> interpolated
    kps[:2, :, 2] = 0.0      # leading gap -> trimmed by the interval
    kps[-3:, :, 2] = 0.0     # trailing gap -> trimmed
    params, t0, t1 = F.get_smooth_bbox_params(kps, vis_thresh=0.3)
    assert t0 == 2 and t1 == T - 3
    # zeros-prefixed to frame 0, reference surface (smooth_bbox.py:32)
    assert params.shape == (t1, 3)
    np.testing.assert_array_equal(params[:t0], 0.0)
    params = params[t0:t1]
    assert np.all(np.isfinite(params))
    # smoothed center x should increase roughly monotonically
    assert params[-1, 0] > params[0, 0]
    # cxcywh conversion uses the 150px scaling + 1.1 expansion
    boxes = F.bbox_params_to_cxcywh(params)
    np.testing.assert_allclose(boxes[:, 2], 150.0 / params[:, 2] * 1.1,
                               rtol=1e-6)

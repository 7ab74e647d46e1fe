"""Temporal SMPLify refinement: recovering a perturbed fit must reduce the
2D reprojection error toward the ground-truth keypoints."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from tepose_tpu.models.regressor import projection
from tepose_tpu.models.smpl import synthetic_smpl_model, smpl_forward
from tepose_tpu.models.smplify import SmplifyConfig, smplify_refine


def test_smplify_recovers_perturbed_fit(rng):
    smpl = synthetic_smpl_model(seed=0, num_verts=128)
    T = 5

    # ground truth: smooth pose track + fixed shape/cam
    aa_gt = np.cumsum(rng.randn(T, 24, 3).astype(np.float32) * 0.02, axis=0)
    rot_gt = Rotation.from_rotvec(aa_gt.reshape(-1, 3)).as_matrix().reshape(
        T, 24, 3, 3).astype(np.float32)
    betas_gt = np.tile(rng.randn(1, 10).astype(np.float32) * 0.3, (T, 1))
    cam_gt = np.tile(np.array([[0.9, 0.02, -0.01]], np.float32), (T, 1))

    out_gt = smpl_forward(smpl, jnp.asarray(betas_gt), jnp.asarray(rot_gt))
    kp2d_gt = np.asarray(projection(out_gt["joints49"], jnp.asarray(cam_gt)))
    kp_2d = np.concatenate([kp2d_gt, np.ones((T, 49, 1), np.float32)],
                           axis=2)

    # perturbed initial fit
    aa_init = aa_gt + rng.randn(T, 24, 3).astype(np.float32) * 0.1
    rot_init = Rotation.from_rotvec(
        aa_init.reshape(-1, 3)).as_matrix().reshape(T, 24, 3, 3).astype(
            np.float32)
    betas_init = betas_gt + rng.randn(T, 10).astype(np.float32) * 0.3
    cam_init = cam_gt + rng.randn(T, 3).astype(np.float32) * 0.05

    out_init = smpl_forward(smpl, jnp.asarray(betas_init),
                            jnp.asarray(rot_init))
    err_init = float(np.mean(
        (np.asarray(projection(out_init["joints49"],
                               jnp.asarray(cam_init))) - kp2d_gt) ** 2))

    cfg = SmplifyConfig(num_iters=80, lr=0.02)
    refined = smplify_refine(smpl, jnp.asarray(rot_init),
                             jnp.asarray(betas_init), jnp.asarray(cam_init),
                             jnp.asarray(kp_2d), cfg)

    err_ref = float(np.mean((np.asarray(refined["kp_2d"]) - kp2d_gt) ** 2))
    assert err_ref < err_init * 0.3, (err_init, err_ref)

    losses = np.asarray(refined["losses"])
    assert losses[-1] < losses[0]
    assert np.all(np.isfinite(np.asarray(refined["verts"])))
    assert refined["theta"].shape == (T, 85)

    # rotations stay valid
    rm = np.asarray(refined["rotmat"]).reshape(-1, 3, 3)
    eye = np.einsum("bij,bkj->bik", rm, rm)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)

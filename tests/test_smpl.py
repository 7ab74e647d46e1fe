"""LBS parity tests: JAX SMPL forward vs a straightforward numpy oracle.

The oracle implements the SMPL paper math (Loper et al. 2015) with explicit
per-sample loops — deliberately different code shape from the vectorised
einsum implementation under test.
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from tepose_tpu.models.smpl import (
    smpl_forward,
    synthetic_smpl_model,
    regress_h36m_joints,
    H36M_TO_J14,
    NUM_SMPL_JOINTS,
)


def numpy_smpl_oracle(model, betas, rot_mats):
    """Single-sample SMPL forward in plain numpy loops."""
    v_template = np.asarray(model.v_template)
    shapedirs = np.asarray(model.shapedirs)
    posedirs = np.asarray(model.posedirs)
    j_regressor = np.asarray(model.j_regressor)
    lbs_w = np.asarray(model.lbs_weights)
    parents = list(model.parents)
    J = NUM_SMPL_JOINTS
    V = v_template.shape[0]

    # shape blendshapes
    v_shaped = v_template.copy()
    for s in range(10):
        v_shaped = v_shaped + shapedirs[:, :, s] * betas[s]

    joints_rest = j_regressor @ v_shaped  # (24, 3)

    # pose blendshapes
    pose_feat = (rot_mats[1:] - np.eye(3)).reshape(-1)  # (207,)
    v_posed = v_shaped + (pose_feat @ posedirs).reshape(V, 3)

    # kinematic chain
    G = np.zeros((J, 4, 4))
    for i in range(J):
        local = np.eye(4)
        local[:3, :3] = rot_mats[i]
        if parents[i] < 0:
            local[:3, 3] = joints_rest[i]
            G[i] = local
        else:
            local[:3, 3] = joints_rest[i] - joints_rest[parents[i]]
            G[i] = G[parents[i]] @ local
    posed_joints = G[:, :3, 3].copy()

    # remove rest-pose joint contribution
    A = np.zeros_like(G)
    for i in range(J):
        A[i] = G[i].copy()
        A[i][:3, 3] -= G[i][:3, :3] @ joints_rest[i]

    verts = np.zeros((V, 3))
    for v in range(V):
        T = np.zeros((4, 4))
        for j in range(J):
            T += lbs_w[v, j] * A[j]
        verts[v] = T[:3, :3] @ v_posed[v] + T[:3, 3]
    return verts, posed_joints


def test_lbs_matches_numpy_oracle(rng):
    model = synthetic_smpl_model(seed=0, num_verts=200)
    B = 3
    betas = rng.randn(B, 10).astype(np.float32) * 0.5
    aa = rng.randn(B, 24, 3).astype(np.float32) * 0.4
    rot = Rotation.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(
        B, 24, 3, 3).astype(np.float32)

    out = smpl_forward(model, jnp.asarray(betas), jnp.asarray(rot))
    verts = np.asarray(out["verts"])
    joints24 = np.asarray(out["joints24"])

    for b in range(B):
        v_ref, j_ref = numpy_smpl_oracle(model, betas[b], rot[b])
        np.testing.assert_allclose(verts[b], v_ref, atol=1e-4)
        np.testing.assert_allclose(joints24[b], j_ref, atol=1e-4)


def test_joint49_assembly(rng):
    model = synthetic_smpl_model(seed=1, num_verts=200)
    betas = jnp.zeros((2, 10))
    rot = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
    out = smpl_forward(model, betas, rot)
    assert out["joints49"].shape == (2, 49, 3)
    assert out["verts"].shape == (2, 200, 3)

    # Identity pose, zero betas: verts == v_template, joints24 == rest joints.
    np.testing.assert_allclose(
        np.asarray(out["verts"][0]), np.asarray(model.v_template), atol=1e-5)
    rest = np.asarray(model.j_regressor) @ np.asarray(model.v_template)
    np.testing.assert_allclose(np.asarray(out["joints24"][0]), rest, atol=1e-5)

    # joints49 respects the reordering map: entry 8 of JOINT_NAMES is
    # 'OP MidHip' -> base joint 0.
    np.testing.assert_allclose(
        np.asarray(out["joints49"][0, 8]), rest[0], atol=1e-5)


def test_pose2rot_path(rng):
    model = synthetic_smpl_model(seed=2, num_verts=128)
    betas = jnp.asarray(rng.randn(2, 10).astype(np.float32) * 0.3)
    aa = rng.randn(2, 72).astype(np.float32) * 0.3
    rot = Rotation.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(
        2, 24, 3, 3).astype(np.float32)

    out_aa = smpl_forward(model, betas, jnp.asarray(aa), pose2rot=True)
    out_rm = smpl_forward(model, betas, jnp.asarray(rot))
    np.testing.assert_allclose(
        np.asarray(out_aa["verts"]), np.asarray(out_rm["verts"]), atol=1e-4)


def test_smpl_jit_and_grad(rng):
    """The SMPL model pytree must jit cleanly and be differentiable."""
    model = synthetic_smpl_model(seed=3, num_verts=96)

    @jax.jit
    def f(m, betas, rot):
        return jnp.sum(smpl_forward(m, betas, rot)["verts"] ** 2)

    betas = jnp.asarray(rng.randn(2, 10).astype(np.float32) * 0.1)
    rot = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
    v = f(model, betas, rot)
    assert np.isfinite(float(v))

    g = jax.grad(lambda b: f(model, b, rot))(betas)
    assert np.all(np.isfinite(np.asarray(g)))


def test_h36m_regressor_path(rng):
    model = synthetic_smpl_model(seed=4, num_verts=96)
    out = smpl_forward(model, jnp.zeros((2, 10)),
                       jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3)))
    jreg = jnp.asarray(rng.rand(17, 96).astype(np.float32))
    j14 = regress_h36m_joints(out["verts"], jreg, subset=np.array(H36M_TO_J14))
    assert j14.shape == (2, 14, 3)
    ref = np.asarray(jreg) @ np.asarray(out["verts"][0])
    np.testing.assert_allclose(
        np.asarray(j14[0]), ref[np.array(H36M_TO_J14)], atol=1e-5)


def test_smpl_joints_reduced_matches_full(rng):
    """The vertex-free joint path (joint selection folded through LBS) must
    equal smpl_forward's joints49 up to fp reassociation."""
    import jax.numpy as jnp

    from tepose_tpu.models.smpl import (
        smpl_forward, smpl_joints_reduced, synthetic_smpl_model)
    from tepose_tpu.ops.geometry import batch_rodrigues

    for num_verts in (96, 480):
        model = synthetic_smpl_model(seed=1, num_verts=num_verts)
        B = 4
        betas = jnp.asarray(rng.randn(B, 10).astype(np.float32) * 0.5)
        aa = rng.randn(B, 24, 3).astype(np.float32) * 0.4
        rot = batch_rodrigues(jnp.asarray(aa))

        full = smpl_forward(model, betas, rot)["joints49"]
        reduced = smpl_joints_reduced(model, betas, rot)
        np.testing.assert_allclose(np.asarray(reduced), np.asarray(full),
                                   atol=3e-6)

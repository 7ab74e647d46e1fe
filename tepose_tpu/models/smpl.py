"""SMPL body model in pure JAX: blend shapes, pose correctives, LBS skinning.

This replaces the external `smplx` dependency of the reference (the reference
wraps `smplx.SMPL` to emit 49 joints; ref: lib/models/smpl.py:61-84). Here the
whole chain — shape blendshapes, pose-dependent corrective blendshapes, joint
regression, the kinematic-tree rigid transform, and linear blend skinning — is
implemented as batched einsums so XLA can tile everything onto the MXU and fuse
the elementwise tails.

Model data is loaded from a single `.npz` (converted once from the official
SMPL `.pkl` via tools/convert_smpl.py, which the user runs on their own
licensed download — the pickles themselves are never shipped).

Joint conventions (all matching the reference):
  * base joints  0..23  : kinematic skeleton (J_regressor on the *shaped* mesh,
                          then rigidly posed — NOT regressed from posed verts)
  * joints      24..44  : 21 surface-vertex keypoints (face 5, feet 6, hand
                          tips 10) picked off the posed mesh
  * joints      45..53  : 9 extra joints from `J_regressor_extra` (ref:
                          lib/models/smpl.py:67-75)
  * the final 49-joint output reorders those 54 via JOINT_MAP/JOINT_NAMES
    (ref: lib/models/smpl.py:14-53)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tepose_tpu.ops.geometry import batch_rodrigues

# ---------------------------------------------------------------------------
# Public joint constants (ref: lib/models/smpl.py:14-58)
# ---------------------------------------------------------------------------

JOINT_MAP = {
    "OP Nose": 24, "OP Neck": 12, "OP RShoulder": 17,
    "OP RElbow": 19, "OP RWrist": 21, "OP LShoulder": 16,
    "OP LElbow": 18, "OP LWrist": 20, "OP MidHip": 0,
    "OP RHip": 2, "OP RKnee": 5, "OP RAnkle": 8,
    "OP LHip": 1, "OP LKnee": 4, "OP LAnkle": 7,
    "OP REye": 25, "OP LEye": 26, "OP REar": 27,
    "OP LEar": 28, "OP LBigToe": 29, "OP LSmallToe": 30,
    "OP LHeel": 31, "OP RBigToe": 32, "OP RSmallToe": 33, "OP RHeel": 34,
    "Right Ankle": 8, "Right Knee": 5, "Right Hip": 45,
    "Left Hip": 46, "Left Knee": 4, "Left Ankle": 7,
    "Right Wrist": 21, "Right Elbow": 19, "Right Shoulder": 17,
    "Left Shoulder": 16, "Left Elbow": 18, "Left Wrist": 20,
    "Neck (LSP)": 47, "Top of Head (LSP)": 48,
    "Pelvis (MPII)": 49, "Thorax (MPII)": 50,
    "Spine (H36M)": 51, "Jaw (H36M)": 52,
    "Head (H36M)": 53, "Nose": 24, "Left Eye": 26,
    "Right Eye": 25, "Left Ear": 28, "Right Ear": 27,
}

JOINT_NAMES = [
    "OP Nose", "OP Neck", "OP RShoulder",
    "OP RElbow", "OP RWrist", "OP LShoulder",
    "OP LElbow", "OP LWrist", "OP MidHip",
    "OP RHip", "OP RKnee", "OP RAnkle",
    "OP LHip", "OP LKnee", "OP LAnkle",
    "OP REye", "OP LEye", "OP REar",
    "OP LEar", "OP LBigToe", "OP LSmallToe",
    "OP LHeel", "OP RBigToe", "OP RSmallToe", "OP RHeel",
    "Right Ankle", "Right Knee", "Right Hip",
    "Left Hip", "Left Knee", "Left Ankle",
    "Right Wrist", "Right Elbow", "Right Shoulder",
    "Left Shoulder", "Left Elbow", "Left Wrist",
    "Neck (LSP)", "Top of Head (LSP)",
    "Pelvis (MPII)", "Thorax (MPII)",
    "Spine (H36M)", "Jaw (H36M)",
    "Head (H36M)", "Nose", "Left Eye",
    "Right Eye", "Left Ear", "Right Ear",
]

JOINT_IDS = {name: i for i, name in enumerate(JOINT_NAMES)}
H36M_TO_J17 = [6, 5, 4, 1, 2, 3, 16, 15, 14, 11, 12, 13, 8, 10, 0, 7, 9]
H36M_TO_J14 = H36M_TO_J17[:14]

# Surface-vertex keypoint ids on the SMPL mesh (public smplh vertex-id table).
# Order matters: face(5) + feet(6) + hand tips(10) are appended after the 24
# skeleton joints, giving the 45-joint base the reference's JOINT_MAP indexes.
VERTEX_JOINT_IDS = np.array(
    [
        332, 6260, 2800, 4071, 583,               # nose, reye, leye, rear, lear
        3216, 3226, 3387, 6617, 6624, 6787,       # LBigToe..RHeel
        2746, 2319, 2445, 2556, 2673,             # left hand tips
        6191, 5782, 5905, 6016, 6133,             # right hand tips
    ],
    dtype=np.int32,
)

NUM_SMPL_JOINTS = 24
NUM_BETAS = 10
NUM_VERTS = 6890

# The standard SMPL kinematic tree (parent of joint i; -1 = root).
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9,
     12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)


# ---------------------------------------------------------------------------
# Assets
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SmplModel:
    """SMPL model tensors as a jax pytree (all jnp arrays, float32).

    Shapes (V = num vertices, J = 24, B10 = 10 betas):
      v_template   (V, 3)
      shapedirs    (V, 3, B10)
      posedirs     (207, V*3)    — (J-1)*9 pose-corrective basis
      j_regressor  (J, V)
      lbs_weights  (V, J)
      parents      (J,) tuple    — static aux field (not traced)
      j_regressor_extra (9, V)   — extra-joint regressor (SPIN's
                                   J_regressor_extra.npy)
      joint_map    (49,) tuple   — static aux field
      vertex_joint_ids (21,) tuple — static aux field

    Mesh faces are not part of the pytree; use `load_smpl_faces` (rendering /
    export only).
    """

    v_template: jnp.ndarray
    shapedirs: jnp.ndarray
    posedirs: jnp.ndarray
    j_regressor: jnp.ndarray
    lbs_weights: jnp.ndarray
    j_regressor_extra: jnp.ndarray
    # Static (meta) fields: small hashable tuples so jit caching works.
    parents: tuple = dataclasses.field(metadata=dict(static=True))
    joint_map: tuple = dataclasses.field(metadata=dict(static=True))
    vertex_joint_ids: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]


def _default_joint_map() -> tuple:
    return tuple(JOINT_MAP[name] for name in JOINT_NAMES)


def load_smpl_assets(npz_path: str,
                     allow_missing_extra: bool = False) -> SmplModel:
    """Load a converted SMPL `.npz` (see tools/convert_smpl.py).

    The extra-joint regressor is REQUIRED by default: without it, joints
    45-53 of the 49-joint output (incl. the hips used for pelvis
    alignment in the 3D losses) would silently be zeros and training/eval
    would run to completion with wrecked supervision. Pass
    `allow_missing_extra=True` only for 24-joint-only use cases.
    """
    with np.load(npz_path) as z:
        def f32(k):
            return jnp.asarray(z[k], dtype=jnp.float32)

        if "j_regressor_extra" in z:
            j_extra = jnp.asarray(z["j_regressor_extra"], jnp.float32)
        elif allow_missing_extra:
            j_extra = jnp.zeros((9, z["v_template"].shape[0]), jnp.float32)
        else:
            raise KeyError(
                f"{npz_path} has no 'j_regressor_extra' — re-run "
                "tools/convert_smpl.py with --j-regressor-extra "
                "J_regressor_extra.npy (ref: lib/models/smpl.py:61-84); "
                "without it joints 45-53 of the 49-joint output are zeros. "
                "Pass allow_missing_extra=True to load anyway.")
        return SmplModel(
            v_template=f32("v_template"),
            shapedirs=f32("shapedirs")[..., :NUM_BETAS],
            posedirs=f32("posedirs"),
            j_regressor=f32("j_regressor"),
            lbs_weights=f32("lbs_weights"),
            j_regressor_extra=j_extra,
            parents=tuple(
                np.asarray(z["parents"]).astype(int).tolist()
            ) if "parents" in z else tuple(SMPL_PARENTS.tolist()),
            joint_map=_default_joint_map(),
            vertex_joint_ids=tuple(VERTEX_JOINT_IDS.tolist()),
        )


def load_smpl_faces(npz_path: str) -> np.ndarray:
    """Triangle faces (F, 3) for rendering/export; empty if absent."""
    with np.load(npz_path) as z:
        if "faces" in z:
            return np.asarray(z["faces"], np.int32)
    return np.zeros((0, 3), np.int32)


def synthetic_smpl_model(seed: int = 0, num_verts: int = NUM_VERTS) -> SmplModel:
    """A random-but-valid SMPL-shaped model for tests and benchmarks.

    Real SMPL pickles are license-gated and absent from CI; this generates
    tensors with the correct shapes, a valid kinematic tree, and row-normalised
    regressors/skinning weights so the forward pass is numerically sane.
    """
    rs = np.random.RandomState(seed)
    J = NUM_SMPL_JOINTS
    v_template = rs.randn(num_verts, 3).astype(np.float32) * 0.3
    shapedirs = rs.randn(num_verts, 3, NUM_BETAS).astype(np.float32) * 0.01
    posedirs = rs.randn((J - 1) * 9, num_verts * 3).astype(np.float32) * 0.001

    def norm_rows(m):
        m = np.abs(m)
        return (m / m.sum(axis=1, keepdims=True)).astype(np.float32)

    j_regressor = norm_rows(rs.rand(J, num_verts) ** 8)
    lbs_w = norm_rows(rs.rand(num_verts, J) ** 8)
    j_extra = norm_rows(rs.rand(9, num_verts) ** 8)
    vjid = (
        tuple(VERTEX_JOINT_IDS.tolist())
        if num_verts >= NUM_VERTS
        else tuple(rs.randint(0, num_verts, size=21).tolist())
    )
    return SmplModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(j_regressor),
        lbs_weights=jnp.asarray(lbs_w),
        j_regressor_extra=jnp.asarray(j_extra),
        parents=tuple(SMPL_PARENTS.tolist()),
        joint_map=_default_joint_map(),
        vertex_joint_ids=vjid,
    )


# ---------------------------------------------------------------------------
# Forward (LBS)
# ---------------------------------------------------------------------------


def _rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                     parents: np.ndarray):
    """Pose the kinematic tree.

    rot_mats (B, J, 3, 3), joints (B, J, 3) rest-pose joint locations.
    Returns (posed_joints (B, J, 3), rel_transforms (B, J, 4, 4)).

    The chain walk is a Python loop over the 24 static joints — unrolled at
    trace time into 24 tiny (4x4) matmuls, which XLA fuses; a lax.scan would
    serialise on dynamic gather instead.
    """
    B, J = joints.shape[:2]
    rel_joints = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1]), joints[:, np.asarray(parents[1:])]],
        axis=1,
    )
    # (B, J, 4, 4) local transforms
    top = jnp.concatenate([rot_mats, rel_joints[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], rot_mats.dtype), (B, J, 1, 4))
    local = jnp.concatenate([top, bottom], axis=-2)

    results = [local[:, 0]]
    for i in range(1, J):
        results.append(results[parents[i]] @ local[:, i])
    global_tf = jnp.stack(results, axis=1)  # (B, J, 4, 4)

    posed_joints = global_tf[..., :3, 3]

    # Subtract the contribution of the rest-pose joint location so the
    # transform maps *rest-pose* vertices (A - pad(A @ [j, 0])).
    joints_h = jnp.concatenate([joints, jnp.zeros((B, J, 1), joints.dtype)],
                               axis=-1)
    correction = jnp.einsum("bjik,bjk->bji", global_tf, joints_h)
    rel = global_tf.at[..., :3, 3].add(-correction[..., :3])
    return posed_joints, rel


def smpl_forward(
    model: SmplModel,
    betas: jnp.ndarray,
    pose: jnp.ndarray,
    pose2rot: bool = False,
    skinning: str = "xla",
):
    """SMPL forward pass.

    Args:
      betas: (B, 10) shape coefficients.
      pose:  (B, 24, 3, 3) rotation matrices if not pose2rot, else (B, 72)
             axis-angle (global_orient first).
      pose2rot: convert axis-angle to rotmats first (ref: smplx `pose2rot`,
             used by the MPVPE GT-vertex path, eval_utils.py:168).
      skinning: "xla" (default einsum path) or "pallas" (fused TPU kernel,
             ops/lbs_pallas.py) — numerically equivalent.

    Returns dict with:
      verts    (B, V, 3)
      joints49 (B, 49, 3) — reference 49-joint convention
      joints24 (B, 24, 3) — posed skeleton joints
    """
    B = betas.shape[0]
    if pose2rot:
        rot_mats = batch_rodrigues(pose.reshape(B, NUM_SMPL_JOINTS, 3))
    else:
        rot_mats = pose

    # 1. Shape blendshapes: v = T + S @ beta        (MXU: (V*3, 10) x (10, B))
    v_shaped = model.v_template + jnp.einsum(
        "bl,mkl->bmk", betas, model.shapedirs)

    # 2. Rest-pose joints from the shaped mesh.
    joints_rest = jnp.einsum("jv,bvk->bjk", model.j_regressor, v_shaped)

    # 3. Pose-corrective blendshapes: (R - I) flattened over the 23 body joints.
    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # (B, 207)
    pose_offsets = (pose_feature @ model.posedirs).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    # 4. Kinematic chain.
    posed_joints, rel_tf = _rigid_transform(rot_mats, joints_rest,
                                            model.parents)

    # 5. Linear blend skinning: per-vertex 4x4 = weights @ joint transforms.
    if skinning == "pallas":
        # fused Pallas kernel — T never materialises in HBM
        # (see ops/lbs_pallas.py)
        from tepose_tpu.ops.lbs_pallas import lbs_skinning_pallas

        verts = lbs_skinning_pallas(model.lbs_weights, rel_tf, v_posed)
    else:
        T = jnp.einsum("vj,bjik->bvik", model.lbs_weights,
                       rel_tf)  # (B, V, 4, 4)
        verts = (jnp.einsum("bvik,bvk->bvi", T[..., :3, :3], v_posed)
                 + T[..., :3, 3])

    # 6. 45-joint base = skeleton(24) + surface keypoints(21), then 9 extra
    #    regressed joints, reordered to the 49-joint output.
    vertex_joints = verts[:, np.asarray(model.vertex_joint_ids)]
    extra_joints = jnp.einsum("jv,bvk->bjk", model.j_regressor_extra, verts)
    joints54 = jnp.concatenate([posed_joints, vertex_joints, extra_joints],
                               axis=1)
    joints49 = joints54[:, np.asarray(model.joint_map)]

    return {
        "verts": verts,
        "joints49": joints49,
        "joints24": posed_joints,
    }


def joint_reduction_tensors(model: SmplModel):
    """Collapse the 49-joint output's dependence on the mesh into small
    reduction tensors (TPU-new; no reference counterpart).

    Every non-skeleton joint is LINEAR in the posed vertices: 21 joints are
    one-hot vertex picks and 9 come from `j_regressor_extra`. Folding that
    (30, V) selection through linear-blend skinning gives per-(joint, bone)
    blended rest points that are themselves linear in betas and in the
    pose-corrective feature — so the training path never needs the
    (B, V, 4, 4) skinning tensor at all (see `smpl_joints_reduced`).

    Returns (A0 (30,24,3), AS (30,24,3,10), AP (30,24,3,207), W1 (30,24)).
    When the SMPL tensors are jit-closure constants (the training segment),
    XLA folds this whole precompute at compile time.
    """
    V = model.num_verts
    vjid = np.asarray(model.vertex_joint_ids)
    sel = jnp.zeros((21, V), model.v_template.dtype)
    sel = sel.at[np.arange(21), vjid].set(1.0)
    Wsel = jnp.concatenate([sel, model.j_regressor_extra], axis=0)  # (30, V)

    WW = jnp.einsum("jv,vk->jvk", Wsel, model.lbs_weights)   # (30, V, 24)
    A0 = jnp.einsum("jvk,vc->jkc", WW, model.v_template)
    AS = jnp.einsum("jvk,vcl->jkcl", WW, model.shapedirs)
    # posedirs is stored (207, V*3): reshape to (207, V, 3)
    pd = model.posedirs.reshape(model.posedirs.shape[0], V, 3)
    AP = jnp.einsum("jvk,pvc->jkcp", WW, pd)
    W1 = WW.sum(axis=1)                                      # (30, 24)
    return A0, AS, AP, W1


def smpl_joints_reduced(model: SmplModel, betas: jnp.ndarray,
                        rot_mats: jnp.ndarray) -> jnp.ndarray:
    """49-joint output WITHOUT materialising the mesh — exact reordering of
    the LBS linear algebra (see `joint_reduction_tensors`), within fp
    reassociation error of `smpl_forward(...)["joints49"]`.

    The training loss only reads joints/theta (ref: lib/core/loss.py:59-171
    never touches verts), so the train step uses this path: it removes the
    (B, V, 4, 4) skinning tensor from both the forward and backward pass.
    betas (B, 10); rot_mats (B, 24, 3, 3). Returns (B, 49, 3).
    """
    B = betas.shape[0]
    A0, AS, AP, W1 = joint_reduction_tensors(model)

    joints_rest = (
        jnp.einsum("jv,bvk->bjk", model.j_regressor,
                   model.v_template[None])
        + jnp.einsum("bl,jkl->bjk",
                     betas, jnp.einsum("jv,vkl->jkl", model.j_regressor,
                                       model.shapedirs)))
    posed_joints, rel_tf = _rigid_transform(rot_mats, joints_rest,
                                            model.parents)

    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # (B, 207)

    # blended rest points per (selected joint, bone): linear in betas and
    # in the pose feature
    p_sel = (A0[None]
             + jnp.einsum("bl,jkcl->bjkc", betas, AS)
             + jnp.einsum("bp,jkcp->bjkc", pose_feature, AP))  # (B,30,24,3)

    R = rel_tf[..., :3, :3]                                   # (B, 24, 3, 3)
    t = rel_tf[..., :3, 3]                                    # (B, 24, 3)
    joints_sel = (jnp.einsum("bkic,bjkc->bji", R, p_sel)
                  + jnp.einsum("jk,bki->bji", W1, t))         # (B, 30, 3)

    joints54 = jnp.concatenate([posed_joints, joints_sel], axis=1)
    return joints54[:, np.asarray(model.joint_map)]


def regress_h36m_joints(
    verts: jnp.ndarray, j_regressor_h36m: jnp.ndarray,
    subset: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """17-joint H36M regression off the posed mesh, optionally subset to J14.

    ref: lib/models/spin.py:275-278 (J_regressor path in Regressor.forward).
    """
    joints = jnp.einsum("jv,bvk->bjk", j_regressor_h36m, verts)
    if subset is not None:
        joints = joints[:, np.asarray(subset)]
    return joints

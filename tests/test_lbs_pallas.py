"""Pallas LBS skinning kernel: parity with the XLA einsum path (interpret
mode on CPU; the compiled kernel is exercised on TPU by the perf harness)."""

import numpy as np
import jax
import jax.numpy as jnp

from tepose_tpu.ops.lbs_pallas import lbs_skinning_pallas
from tepose_tpu.models.smpl import synthetic_smpl_model, smpl_forward


def test_kernel_matches_einsum(rng):
    B, V, J = 3, 700, 24
    w = np.abs(rng.rand(V, J)).astype(np.float32)
    w /= w.sum(1, keepdims=True)
    A = rng.randn(B, J, 4, 4).astype(np.float32)
    A[:, :, 3] = [0, 0, 0, 1]
    v = rng.randn(B, V, 3).astype(np.float32)

    ref_T = np.einsum("vj,bjik->bvik", w, A)
    ref = np.einsum("bvik,bvk->bvi", ref_T[..., :3, :3], v) \
        + ref_T[..., :3, 3]
    out = np.asarray(lbs_skinning_pallas(
        jnp.asarray(w), jnp.asarray(A), jnp.asarray(v), interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_smpl_forward_skinning_flag(rng):
    """smpl_forward(skinning='pallas') == default path (interpret on CPU)."""
    import tepose_tpu.ops.lbs_pallas as LP

    model = synthetic_smpl_model(seed=0, num_verts=600)
    betas = jnp.asarray(rng.randn(2, 10).astype(np.float32) * 0.3)
    from scipy.spatial.transform import Rotation

    rot = jnp.asarray(Rotation.from_rotvec(
        rng.randn(48, 3) * 0.3).as_matrix().reshape(2, 24, 3, 3)
        .astype(np.float32))

    ref = smpl_forward(model, betas, rot)["verts"]
    orig = LP.lbs_skinning_pallas
    LP.lbs_skinning_pallas = lambda w, a, v: orig(w, a, v, interpret=True)
    try:
        out = smpl_forward(model, betas, rot, skinning="pallas")["verts"]
    finally:
        LP.lbs_skinning_pallas = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

"""Parity tests: GRU/encoders/regressor against torch oracles with shared
weights, plus shape/jit sanity for the assembled TePose/VIBE models."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from tepose_tpu.models import layers as L
from tepose_tpu.models import temporal as T
from tepose_tpu.models.regressor import (
    regressor_init, regressor_apply, ief_iterations, projection)
from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import (
    TePoseConfig, VibeConfig, tepose_init, tepose_apply, vibe_init, vibe_apply)


def copy_gru_params_to_torch(params, gru: nn.GRU):
    """Copy our pytree GRU params into a torch nn.GRU (same key naming)."""
    sd = {}
    for name in params:
        sd[name] = torch.from_numpy(np.asarray(params[name]))
    gru.load_state_dict(sd)


@pytest.mark.parametrize("n_layers,bidirectional", [
    (1, False), (2, False), (1, True), (2, True)])
def test_gru_matches_torch(rng, n_layers, bidirectional):
    in_dim, hidden, Tlen, B = 33, 17, 6, 4
    params = L.gru_init(jax.random.PRNGKey(0), in_dim, hidden,
                        n_layers, bidirectional)
    gru = nn.GRU(input_size=in_dim, hidden_size=hidden, num_layers=n_layers,
                 bidirectional=bidirectional)
    copy_gru_params_to_torch(params, gru)

    x = rng.randn(Tlen, B, in_dim).astype(np.float32)
    ours = np.asarray(L.gru_apply(params, jnp.asarray(x), n_layers,
                                  bidirectional))
    with torch.no_grad():
        ref, _ = gru(torch.from_numpy(x))
    np.testing.assert_allclose(ours, ref.numpy(), atol=2e-5)


def test_temporal_encoder_matches_torch(rng):
    """TePose dual-GRU encoder vs a torch assembly of nn.GRU + nn.Linear."""
    n_layers, hidden = 2, 64
    in_dim = 100
    params = T.temporal_encoder_init(jax.random.PRNGKey(1), n_layers, hidden,
                                     input_size=in_dim)

    gru_fwd = nn.GRU(in_dim, hidden, num_layers=n_layers)
    gru_rec = nn.GRU(in_dim, hidden, num_layers=n_layers, bidirectional=True)
    lin_fwd = nn.Linear(hidden, 2048)
    lin_rec = nn.Linear(hidden * 2, 2048)
    copy_gru_params_to_torch(params["gru_fwd"], gru_fwd)
    copy_gru_params_to_torch(params["gru_rec"], gru_rec)
    lin_fwd.load_state_dict({
        "weight": torch.from_numpy(np.asarray(params["linear_fwd"]["weight"])),
        "bias": torch.from_numpy(np.asarray(params["linear_fwd"]["bias"]))})
    lin_rec.load_state_dict({
        "weight": torch.from_numpy(np.asarray(params["linear_rec"]["weight"])),
        "bias": torch.from_numpy(np.asarray(params["linear_rec"]["bias"]))})

    x = rng.randn(3, 6, in_dim).astype(np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(x)
        y, _ = gru_fwd(xt.permute(1, 0, 2))
        y_fwd = lin_fwd(torch.relu(y[-1]))
        x_rec = torch.flip(xt, dims=[1])
        y_rec, _ = gru_rec(x_rec.permute(1, 0, 2))
        y_rec = lin_rec(torch.relu(y_rec[0]))
        ref_eval = ((y_fwd + y_rec) / 2).numpy()
        ref_train = torch.stack([y_fwd, y_rec], dim=1).numpy()

    ours_eval = np.asarray(
        T.temporal_encoder_apply(params, jnp.asarray(x), n_layers))
    ours_train = np.asarray(
        T.temporal_encoder_apply(params, jnp.asarray(x), n_layers, train=True))
    np.testing.assert_allclose(ours_eval, ref_eval, atol=2e-5)
    np.testing.assert_allclose(ours_train, ref_train, atol=2e-5)


def test_ief_iterations_match_torch(rng):
    params = regressor_init(jax.random.PRNGKey(2))
    fc1 = nn.Linear(2048 + 144 + 13, 1024)
    fc2 = nn.Linear(1024, 1024)
    heads = {n: nn.Linear(1024, d)
             for n, d in [("decpose", 144), ("decshape", 10), ("deccam", 3)]}
    for mod, key in [(fc1, "fc1"), (fc2, "fc2")] + [
            (heads[n], n) for n in heads]:
        mod.load_state_dict({
            "weight": torch.from_numpy(np.asarray(params[key]["weight"])),
            "bias": torch.from_numpy(np.asarray(params[key]["bias"]))})

    B = 5
    x = rng.randn(B, 2048).astype(np.float32)
    with torch.no_grad():
        pose = torch.from_numpy(np.asarray(params["init_pose"])).expand(B, -1)
        shape = torch.from_numpy(np.asarray(params["init_shape"])).expand(B, -1)
        cam = torch.from_numpy(np.asarray(params["init_cam"])).expand(B, -1)
        xt = torch.from_numpy(x)
        for _ in range(3):
            xc = torch.cat([xt, pose, shape, cam], dim=1)
            xc = fc2(fc1(xc))  # dropout is identity in eval
            pose = heads["decpose"](xc) + pose
            shape = heads["decshape"](xc) + shape
            cam = heads["deccam"](xc) + cam

    p, s, c = ief_iterations(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(p), pose.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s), shape.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c), cam.numpy(), atol=2e-5)


def test_projection_matches_torch(rng):
    joints = rng.randn(4, 49, 3).astype(np.float32)
    joints[..., 2] += 5.0  # keep in front of camera
    cam = np.abs(rng.randn(4, 3)).astype(np.float32) + 0.5

    ours = np.asarray(projection(jnp.asarray(joints), jnp.asarray(cam)))

    with torch.no_grad():
        cam_t = torch.stack([
            torch.from_numpy(cam[:, 1]),
            torch.from_numpy(cam[:, 2]),
            2 * 5000.0 / (224.0 * torch.from_numpy(cam[:, 0]) + 1e-9)],
            dim=-1)
        pts = torch.from_numpy(joints) + cam_t.unsqueeze(1)
        K = torch.zeros(4, 3, 3)
        K[:, 0, 0] = 5000.0
        K[:, 1, 1] = 5000.0
        K[:, 2, 2] = 1.0
        proj = pts / pts[:, :, -1].unsqueeze(-1)
        proj = torch.einsum("bij,bkj->bki", K, proj)[:, :, :-1]
        ref = (proj / 112.0).numpy()

    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_regressor_fallback_init_pose_is_identity(rng):
    """Without mean params, init_pose must decode to identity rotations:
    the 6d vector reshapes to (3,2) in C order, so identity is
    [1,0,0,1,0,0] — the interleaved [1,0,0,0,1,0] decodes to a det-0
    rank-1 matrix and would start every IEF iteration from garbage."""
    from tepose_tpu.ops.geometry import rot6d_to_rotmat

    params = regressor_init(jax.random.PRNGKey(0), mean_params=None)
    rotmats = np.asarray(rot6d_to_rotmat(
        params["init_pose"][0].reshape(24, 6)))
    assert rotmats.shape == (24, 3, 3)
    np.testing.assert_allclose(
        rotmats, np.tile(np.eye(3, dtype=np.float32), (24, 1, 1)),
        atol=1e-6)


def test_regressor_full_output_shapes(rng):
    smpl = synthetic_smpl_model(seed=0, num_verts=128)
    params = regressor_init(jax.random.PRNGKey(3))
    x = jnp.asarray(rng.randn(4, 2048).astype(np.float32) * 0.1)
    out = regressor_apply(params, smpl, x)
    assert out["theta"].shape == (4, 85)
    assert out["verts"].shape == (4, 128, 3)
    assert out["kp_2d"].shape == (4, 49, 2)
    assert out["kp_3d"].shape == (4, 49, 3)
    assert out["rotmat"].shape == (4, 24, 3, 3)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))

    # J_regressor eval path -> 14 joints
    jreg = jnp.asarray(rng.rand(17, 128).astype(np.float32))
    out14 = regressor_apply(params, smpl, x, j_regressor=jreg)
    assert out14["kp_3d"].shape == (4, 14, 3)
    assert out14["kp_2d"].shape == (4, 14, 2)


def test_tepose_apply_shapes_and_jit(rng):
    smpl = synthetic_smpl_model(seed=1, num_verts=96)
    cfg = TePoseConfig(seqlen=6, n_layers=2, hidden_size=64)
    params = tepose_init(jax.random.PRNGKey(4), cfg)
    x = jnp.asarray(rng.randn(3, 6, 2133).astype(np.float32) * 0.1)

    eval_fn = jax.jit(
        lambda p, s, xx: tepose_apply(p, s, xx, cfg, train=False))
    out = eval_fn(params, smpl, x)
    assert out["theta"].shape == (3, 85)
    assert out["verts"].shape == (3, 96, 3)

    out_tr = tepose_apply(params, smpl, x, cfg, train=True,
                          rng=jax.random.PRNGKey(0))
    assert out_tr["theta"].shape == (3, 2, 85)
    assert out_tr["rotmat"].shape == (3, 2, 24, 3, 3)

    # Batch invariance: row 0 alone == row 0 of the batch (no cross coupling)
    out_single = eval_fn(params, smpl, x[:1])
    np.testing.assert_allclose(np.asarray(out_single["theta"][0]),
                               np.asarray(out["theta"][0]), atol=1e-3)


def test_vibe_apply_shapes(rng):
    smpl = synthetic_smpl_model(seed=2, num_verts=96)
    cfg = VibeConfig(seqlen=8, n_layers=2, hidden_size=32, add_linear=True)
    params = vibe_init(jax.random.PRNGKey(5), cfg)
    x = jnp.asarray(rng.randn(2, 8, 2048).astype(np.float32) * 0.1)
    out = vibe_apply(params, smpl, x, cfg)
    assert out["theta"].shape == (2, 8, 85)
    assert out["verts"].shape == (2, 8, 96, 3)
    assert out["rotmat"].shape == (2, 8, 24, 3, 3)


def test_dropout_behaviour():
    x = jnp.ones((1000,))
    out_eval = L.dropout(jax.random.PRNGKey(0), x, 0.5, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))
    out_train = L.dropout(jax.random.PRNGKey(0), x, 0.5, train=True)
    kept = np.asarray(out_train) != 0
    assert 0.3 < kept.mean() < 0.7
    np.testing.assert_allclose(np.asarray(out_train)[kept], 2.0)

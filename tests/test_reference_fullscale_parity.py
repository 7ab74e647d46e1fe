"""FULL-SIZE end-to-end parity: 6890-vertex SMPL + flagship model shapes.

Every other reference-parity module runs a reduced synthetic SMPL (64-300
vertices) for speed; this one pins the 0.1 mm north-star bar at REAL model
scale (VERDICT r3 #2): the reference's sequential eval loop — torch TePose
(hidden 1024, 2 layers, 2048-d features) + VIBE bootstrap + python window
loop with theta feedback (ref: evaluate.py:233-269) — against our batched
`make_eval_scan`, asserting sub-0.1 mm agreement on joints AND all 6890
vertices across a multi-window feedback rollout (feedback makes errors
compound: frame t's theta feeds window t+1, so a drift beyond rounding
would amplify, not wash out). ref: lib/models/smpl.py:61-84 (the full SMPL
the torch side runs), lib/models/tepose.py.
"""

import os

import numpy as np
import torch

import jax.numpy as jnp

import pytest

import reference_shims as shims
from tepose_tpu.eval.evaluator import make_eval_scan
from tepose_tpu.models.smpl import NUM_VERTS as FULL_VERTS
from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import TePoseConfig, VibeConfig
from tepose_tpu.train.checkpoint import convert_torch_generator

S = 6
HIDDEN = 1024  # flagship (configs/repr_*: MODEL.TGRU.HIDDEN_SIZE)
MM = 1000.0


@pytest.fixture(scope="module")
def full_env(tmp_path_factory):
    shims.install_reference()
    root = tmp_path_factory.mktemp("refdata_fullscale")
    smpl = synthetic_smpl_model(seed=5)  # full 6890 verts
    assert smpl.num_verts == FULL_VERTS == 6890
    rs = np.random.RandomState(17)
    ident6d = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24)
    mean = {
        "pose": ident6d + rs.randn(144).astype(np.float32) * 0.05,
        "shape": rs.randn(10).astype(np.float32) * 0.03,
        "cam": np.array([0.9, 0.01, -0.02], np.float32),
    }
    shims.set_model_npz(shims.save_model_npz(smpl, root / "smpl.npz"))
    shims.make_base_data(str(root), smpl, mean)
    old = os.getcwd()
    os.chdir(root)
    yield {"smpl": smpl}
    os.chdir(old)


def _reference_rollout(model, model_vibe, feats, theta_pseu, jreg_t):
    """The reference eval loop verbatim (evaluate.py:233-269) at full size."""
    F = feats.shape[0]
    curr_feat = torch.from_numpy(feats)
    theta_input = torch.from_numpy(theta_pseu).clone()

    pred_j3ds, pred_thetas, pred_verts = [], [], []
    with torch.no_grad():
        batch = curr_feat[:S].clone().unsqueeze(0)
        output = model_vibe(batch, J_regressor=jreg_t)[-1]
        n_kp = output["kp_3d"].shape[-2]
        pred_j3ds.append(output["kp_3d"][0, :S - 1].reshape(-1, n_kp, 3)
                         .numpy())
        pred_thetas.append(output["theta"][0, :S - 1].reshape(-1, 85).numpy())
        pred_verts.append(output["verts"][0, :S - 1]
                          .reshape(-1, FULL_VERTS, 3).numpy())

        for curr_idx in range(F - S + 1):
            input_feat = torch.zeros((1, S, 2048 + 85)).float()
            input_feat[0, :, :2048] = curr_feat[None, curr_idx:curr_idx + S]
            input_feat[0, :S - 1, 2048:] = theta_input.clone()
            preds = model(input_feat, J_regressor=jreg_t, is_train=False)
            n_kp = preds[-1]["kp_3d"].shape[-2]
            pred_j3ds.append(preds[-1]["kp_3d"].reshape(-1, n_kp, 3).numpy())
            pred_thetas.append(preds[-1]["theta"].reshape(-1, 85).numpy())
            pred_verts.append(preds[-1]["verts"]
                              .reshape(-1, FULL_VERTS, 3).numpy())
            theta_input[:S - 2] = theta_input[1:S - 1].clone()
            theta_input[S - 2] = preds[-1]["theta"].clone().detach()

    return (np.vstack(pred_j3ds), np.vstack(pred_thetas),
            np.vstack(pred_verts))


def test_fullscale_rollout_within_tenth_millimetre(full_env):
    from lib.models.tepose import TePose
    from lib.models.vibe import VIBE

    torch.manual_seed(31)
    model = TePose(seqlen=S, n_layers=2, hidden_size=HIDDEN, pretrained="")
    model.eval()
    model_vibe = VIBE(seqlen=16, n_layers=2, hidden_size=HIDDEN,
                      add_linear=True, pretrained="")
    model_vibe.eval()

    rs = np.random.RandomState(41)
    F = 13  # 8 TePose feedback windows after the VIBE bootstrap
    feats = rs.randn(F, 2048).astype(np.float32) * 0.2
    theta_pseu = rs.randn(S - 1, 85).astype(np.float32) * 0.2
    theta_gt = rs.randn(F, 85).astype(np.float32) * 0.2

    gen_params = convert_torch_generator(model.state_dict())
    vibe_params = convert_torch_generator(model_vibe.state_dict(),
                                          has_vibe_encoder=True)
    model_cfg = TePoseConfig(seqlen=S, n_layers=2, hidden_size=HIDDEN)
    vibe_cfg = VibeConfig(seqlen=16, n_layers=2, hidden_size=HIDDEN,
                          add_linear=True)
    smpl = full_env["smpl"]

    ref_j3d, ref_theta, ref_verts = _reference_rollout(
        model, model_vibe, feats, theta_pseu, None)

    eval_fn = make_eval_scan(smpl, model_cfg, vibe_cfg,
                             num_windows=F - S + 1, use_j_regressor=False)
    out = eval_fn(gen_params, vibe_params, jnp.asarray(feats[None]),
                  jnp.asarray(theta_pseu[None]),
                  jnp.asarray(theta_gt[None]),
                  jnp.zeros((17, smpl.num_verts), jnp.float32))

    assert out["pred_theta"].shape == (1, F, 85)
    j3d = np.asarray(out["pred_j3d"][0])
    theta = np.asarray(out["pred_theta"][0])

    # the 0.1 mm north-star bar, at FULL scale, worst frame/joint/vertex
    j_err = np.abs(j3d - ref_j3d).max() * MM
    assert j_err < 0.1, f"max joint deviation {j_err:.4f} mm"
    # verts: rebuild from our predicted thetas through OUR full SMPL and
    # compare every vertex of every frame against the torch rollout's
    from tepose_tpu.models.smpl import smpl_forward
    from tepose_tpu.ops.geometry import batch_rodrigues

    rm = np.asarray(batch_rodrigues(
        jnp.asarray(theta[:, 3:75].reshape(-1, 3)))).reshape(F, 24, 3, 3)
    verts = np.asarray(smpl_forward(
        smpl, jnp.asarray(theta[:, 75:]), jnp.asarray(rm))["verts"])
    v_err = np.abs(verts - ref_verts).max() * MM
    assert v_err < 0.1, f"max vertex deviation {v_err:.4f} mm"

    # theta parity itself (85-dim: cam + 72 pose + 10 shape)
    t_err = np.abs(theta - ref_theta).max()
    assert t_err < 1e-4, f"max theta deviation {t_err:.2e}"

    # the windows really fed back: a rollout with zeroed feedback must
    # differ (guards against a scan that silently ignores the theta ring)
    out0 = eval_fn(gen_params, vibe_params, jnp.asarray(feats[None]),
                   jnp.zeros_like(jnp.asarray(theta_pseu[None])),
                   jnp.asarray(theta_gt[None]),
                   jnp.zeros((17, smpl.num_verts), jnp.float32))
    assert np.abs(np.asarray(out0["pred_theta"][0]) - theta).max() > 1e-3


def test_fullscale_smpl_verts_match_torch_reference(full_env):
    """Direct SMPL-layer parity at 6890 verts: random poses/shapes through
    the torch smplx-backed reference layer (ref: lib/models/smpl.py:61-84)
    vs our LBS, 0.1 mm on every vertex and every one of the 49 joints."""
    from lib.models.smpl import SMPL, SMPL_MODEL_DIR

    from tepose_tpu.models.smpl import smpl_forward
    from tepose_tpu.ops.geometry import batch_rodrigues

    smpl = full_env["smpl"]
    smpl_t = SMPL(SMPL_MODEL_DIR, batch_size=1, create_transl=False)
    rs = np.random.RandomState(3)
    B = 4
    pose = (rs.randn(B, 72) * 0.4).astype(np.float32)
    betas = (rs.randn(B, 10) * 1.5).astype(np.float32)

    with torch.no_grad():
        t_out = smpl_t(betas=torch.from_numpy(betas),
                       body_pose=torch.from_numpy(pose[:, 3:]),
                       global_orient=torch.from_numpy(pose[:, :3]),
                       pose2rot=True)
    rm = np.asarray(batch_rodrigues(
        jnp.asarray(pose.reshape(-1, 3)))).reshape(B, 24, 3, 3)
    ours = smpl_forward(smpl, jnp.asarray(betas), jnp.asarray(rm))

    v_err = np.abs(np.asarray(ours["verts"])
                   - t_out.vertices.numpy()).max() * MM
    assert v_err < 0.1, f"max vertex deviation {v_err:.4f} mm"
    j_err = np.abs(np.asarray(ours["joints49"])
                   - t_out.joints.numpy()).max() * MM
    assert j_err < 0.1, f"max joint deviation {j_err:.4f} mm"

"""End-to-end parity against the reference's OWN loss and eval algorithm.

Two pillars the model-level suite (test_reference_parity.py) doesn't cover:

1. `lib.core.loss.TePoseLoss` (loss.py:32-171) run as-is on a synthetic
   mixed 2D/3D batch with the real MotionDiscriminatorGCN, vs our masked-mean
   `tepose_loss` on the identical inputs.
2. The reference's sequential eval loop — VIBE bootstrap + B=1 python window
   loop with theta feedback (evaluate.py:233-269) — executed with the real
   torch TePose/VIBE modules, vs our batched `make_eval_scan` lax.scan with
   converted weights, frame for frame.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import reference_shims as shims
from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import TePoseConfig, VibeConfig
from tepose_tpu.models.gcn import motion_discriminator_apply
from tepose_tpu.train.checkpoint import (
    convert_torch_generator,
    convert_torch_discriminator,
)
from tepose_tpu.train.loss import LossWeights, tepose_loss
from tepose_tpu.eval.evaluator import make_eval_scan

NUM_VERTS = 300
S = 6  # seqlen


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    shims.install_reference()
    root = tmp_path_factory.mktemp("refdata_eval")
    smpl = synthetic_smpl_model(seed=3, num_verts=NUM_VERTS)
    rs = np.random.RandomState(11)
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
    yield {"smpl": smpl, "mean": mean}
    os.chdir(old)


# ---------------------------------------------------------------------------
# TePoseLoss parity (ref: loss.py:59-171)
# ---------------------------------------------------------------------------


def _loss_case(ref_env, w_smpl_pattern, seed=0):
    """Drive the real TePoseLoss and our tepose_loss on identical inputs."""
    from lib.core.loss import TePoseLoss
    from lib.models.motion_discriminator_gcn import MotionDiscriminatorGCN

    rs = np.random.RandomState(seed)
    n_2d, n_3d = 2, 3
    B = n_2d + n_3d

    torch.manual_seed(9)
    disc = MotionDiscriminatorGCN(
        num_class=2, num_point=24, num_person=1, num_gcn_scales=13,
        num_g3d_scales=6, graph="lib.graph.smplx_theta.AdjMatrixGraph")
    disc.eval()

    # synthetic generator outputs / targets, reference tensor layouts
    preds = {
        "theta": rs.randn(B, 2, 85).astype(np.float32) * 0.3,
        "kp_2d": rs.randn(B, 2, 49, 2).astype(np.float32),
        "kp_3d": rs.randn(B, 2, 49, 3).astype(np.float32),
    }
    kp_2d_gt = rs.randn(B, 2, 49, 3).astype(np.float32)
    kp_2d_gt[..., 2] = rs.rand(B, 2, 49)  # confidences
    kp_3d_gt = rs.randn(n_3d, 2, 49, 3).astype(np.float32)
    theta_gt = rs.randn(n_3d, 2, 85).astype(np.float32) * 0.3
    w_3d = np.array([1, 0, 1], np.float32)[:n_3d]
    w_smpl = np.asarray(w_smpl_pattern, np.float32)[:n_3d]
    prev_thetas = rs.randn(B, S - 1, 85).astype(np.float32) * 0.3
    real_motion = rs.randn(B, S, 85).astype(np.float32) * 0.3

    # ---- reference loss, boolean-filter semantics ------------------------
    t = torch.from_numpy
    ref_loss = TePoseLoss(e_loss_weight=60., e_3d_loss_weight=30.,
                          e_pose_loss_weight=1., e_shape_loss_weight=0.001,
                          d_motion_loss_weight=1., device="cpu")
    gen_out = [{
        "theta": t(preds["theta"]),
        "kp_2d": t(preds["kp_2d"]),
        "kp_3d": t(preds["kp_3d"]),
    }]
    data_2d = {"kp_2d": t(kp_2d_gt[:n_2d])}
    data_3d = {
        "kp_2d": t(kp_2d_gt[n_2d:]),
        "kp_3d": t(kp_3d_gt),
        "theta": t(theta_gt),
        "w_3d": t(np.repeat(w_3d[:, None], 2, axis=1)),
        "w_smpl": t(np.repeat(w_smpl[:, None], 2, axis=1)),
    }
    with torch.no_grad():
        ref_gen, ref_dis, ref_dict = ref_loss(
            gen_out, data_2d, data_3d,
            pre_mosh=t(prev_thetas),
            data_motion_mosh={"theta": t(real_motion)},
            motion_discriminator=disc,
        )

    # ---- ours, masked-mean semantics --------------------------------------
    params, state = convert_torch_discriminator(disc.state_dict())

    def disc_fn(x, mask):
        out, _ = motion_discriminator_apply(params, state, jnp.asarray(x))
        return out

    our_gen, our_dis, our_dict = tepose_loss(
        {k: jnp.asarray(v) for k, v in preds.items()},
        kp_2d_gt=jnp.asarray(kp_2d_gt),
        kp_3d_gt=jnp.asarray(kp_3d_gt),
        theta_gt=jnp.asarray(theta_gt),
        w_3d=jnp.asarray(w_3d),
        w_smpl=jnp.asarray(w_smpl),
        valid=jnp.ones((B,)),
        n_2d=n_2d,
        prev_thetas=jnp.asarray(prev_thetas),
        real_motion=jnp.asarray(real_motion),
        disc_fn=disc_fn,
        weights=LossWeights(kp_2d=60.0, kp_3d=30.0, pose=1.0, shape=0.001,
                            d_motion=1.0),
    )
    return (ref_gen, ref_dis, ref_dict), (our_gen, our_dis, our_dict)


def test_loss_parity_mixed_smpl(ref_env):
    """Some 3D rows have GT SMPL, others enter the GAN (loss.py:132-136)."""
    (ref_gen, ref_dis, ref_dict), (our_gen, our_dis, our_dict) = _loss_case(
        ref_env, w_smpl_pattern=[1, 0, 1])

    np.testing.assert_allclose(float(our_gen), float(ref_gen), rtol=2e-5)
    np.testing.assert_allclose(float(our_dis), float(ref_dis), rtol=2e-5)
    for key in ("loss_kp_2d", "loss_kp_3d", "loss_shape", "loss_pose",
                "e_m_disc_loss", "d_m_disc_real", "d_m_disc_fake",
                "d_m_disc_loss"):
        assert key in ref_dict, key
        np.testing.assert_allclose(float(our_dict[key]),
                                   float(ref_dict[key]), rtol=2e-5,
                                   atol=1e-7, err_msg=key)


def test_loss_parity_no_smpl(ref_env):
    """All 3D rows lack GT SMPL -> every row feeds the motion GAN."""
    (ref_gen, ref_dis, _), (our_gen, our_dis, _) = _loss_case(
        ref_env, w_smpl_pattern=[0, 0, 0], seed=1)
    np.testing.assert_allclose(float(our_gen), float(ref_gen), rtol=2e-5)
    np.testing.assert_allclose(float(our_dis), float(ref_dis), rtol=2e-5)


# ---------------------------------------------------------------------------
# Sequential eval-loop parity (ref: evaluate.py:233-269)
# ---------------------------------------------------------------------------


def _reference_rollout(model, model_vibe, feats, theta_pseu, jreg_t):
    """The reference's python eval loop, transcribed from evaluate.py:233-269
    with the real torch modules (incl. the zero-theta last slot quirk at
    evaluate.py:252-254)."""
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
                          .reshape(-1, NUM_VERTS, 3).numpy())

        for curr_idx in range(F - S + 1):
            input_feat = torch.zeros((1, S, 2048 + 85)).float()
            input_feat[0, :, :2048] = curr_feat[None, curr_idx:curr_idx + S]
            input_feat[0, :S - 1, 2048:] = theta_input.clone()
            preds = model(input_feat, J_regressor=jreg_t, is_train=False)
            n_kp = preds[-1]["kp_3d"].shape[-2]
            pred_j3ds.append(preds[-1]["kp_3d"].reshape(-1, n_kp, 3).numpy())
            pred_thetas.append(preds[-1]["theta"].reshape(-1, 85).numpy())
            pred_verts.append(preds[-1]["verts"]
                              .reshape(-1, NUM_VERTS, 3).numpy())
            theta_input[:S - 2] = theta_input[1:S - 1].clone()
            theta_input[S - 2] = preds[-1]["theta"].clone().detach()

    return (np.vstack(pred_j3ds), np.vstack(pred_thetas),
            np.vstack(pred_verts))


def _reference_aggregate(videos, dataset):
    """The reference's metric-aggregation block (evaluate.py:392-462),
    calling the real lib.utils.eval_utils functions."""
    from lib.utils.eval_utils import (
        batch_compute_similarity_transform_torch,
        compute_error_accel_eval,
        compute_error_verts,
    )

    full_res = {"mpjpe": [], "mpjpe_pa": [], "accel_err": [], "mpvpe": []}
    for vid in videos:
        pred_j3ds = torch.from_numpy(vid["pred_j3d"]).float()
        target_j3ds = torch.from_numpy(vid["target_j3d"]).float()
        valid_map = vid["valid_map"].copy()

        if dataset == "mpii3d":
            pred_pelvis = pred_j3ds[:, [-3], :]
            target_pelvis = target_j3ds[:, [-3], :]
        else:
            pred_pelvis = (pred_j3ds[:, [2], :] + pred_j3ds[:, [3], :]) / 2.0
            target_pelvis = (target_j3ds[:, [2], :]
                             + target_j3ds[:, [3], :]) / 2.0
        pred_j3ds = pred_j3ds - pred_pelvis
        target_j3ds = target_j3ds - target_pelvis

        m2mm = 1000
        mpjpe = torch.sqrt(((pred_j3ds - target_j3ds) ** 2).sum(dim=-1)) \
            .numpy()[valid_map].mean(axis=-1) * m2mm
        S1_hat = batch_compute_similarity_transform_torch(pred_j3ds,
                                                          target_j3ds)
        mpjpe_pa = torch.sqrt(((S1_hat - target_j3ds) ** 2).sum(dim=-1)) \
            .numpy()[valid_map].mean(axis=-1) * m2mm

        accel_err = np.zeros((len(pred_j3ds),))
        accel_err[1:-1] = compute_error_accel_eval(
            joints_pred=pred_j3ds.numpy(), joints_gt=target_j3ds.numpy()) \
            * m2mm
        if len(valid_map) > 1:
            if valid_map[0] == 0:
                valid_map = valid_map[1:]
            if valid_map[-1] == len(accel_err) - 1:
                valid_map = valid_map[:-1]
            full_res["accel_err"].append(accel_err[valid_map])

        full_res["mpjpe"].append(mpjpe)
        full_res["mpjpe_pa"].append(mpjpe_pa)
        if dataset == "3dpw":
            full_res["mpvpe"].append(compute_error_verts(
                target_theta=torch.from_numpy(vid["target_theta"]),
                pred_verts=torch.from_numpy(vid["pred_verts"])) * m2mm)

    return {k: float(np.mean(np.concatenate(v)))
            for k, v in full_res.items() if v}


@pytest.mark.parametrize("dataset", ["3dpw", "mpii3d"])
def test_metric_aggregation_parity(ref_env, dataset):
    """Our EvalAccumulator must reproduce the reference's Procrustes/accel/
    MPVPE aggregation (incl. valid_map boundary trims) on multi-video input."""
    from tepose_tpu.eval.evaluator import EvalAccumulator
    from tepose_tpu.models.smpl import smpl_forward

    rs = np.random.RandomState(31)
    K = 17 if dataset == "mpii3d" else 14
    videos = []
    for T, vmap in ((11, np.arange(11)), (9, np.array([0, 2, 3, 5, 8]))):
        vid = {
            "pred_j3d": rs.randn(T, K, 3).astype(np.float32) * 0.3,
            "target_j3d": rs.randn(T, K, 3).astype(np.float32) * 0.3,
            "valid_map": vmap,
            "target_theta": rs.randn(T, 85).astype(np.float32) * 0.2,
            "pred_verts": rs.randn(T, NUM_VERTS, 3).astype(np.float32),
        }
        videos.append(vid)

    ref = _reference_aggregate(videos, dataset)

    acc = EvalAccumulator(dataset=dataset)
    smpl = ref_env["smpl"]
    for vid in videos:
        mpvpe = None
        if dataset == "3dpw":
            th = vid["target_theta"]
            gt_verts = np.asarray(smpl_forward(
                smpl, jnp.asarray(th[:, 75:]), jnp.asarray(th[:, 3:75]),
                pose2rot=True)["verts"])
            mpvpe = np.sqrt(
                ((vid["pred_verts"] - gt_verts) ** 2).sum(-1)).mean(-1)
        acc.add_video(vid["pred_j3d"], vid["target_j3d"], mpvpe=mpvpe,
                      valid_map=vid["valid_map"])
    ours = acc.summarize()

    np.testing.assert_allclose(ours["mpjpe"], ref["mpjpe"], rtol=1e-5)
    np.testing.assert_allclose(ours["pa_mpjpe"], ref["mpjpe_pa"], rtol=1e-4)
    np.testing.assert_allclose(ours["accel_err"], ref["accel_err"], rtol=1e-5)
    if dataset == "3dpw":
        np.testing.assert_allclose(ours["mpvpe"], ref["mpvpe"], rtol=1e-4)


def test_eval_rollout_parity(ref_env):
    """Multi-window theta-feedback rollout: reference python loop vs our
    batched lax.scan, with and without the H36M J_regressor."""
    from lib.models.tepose import TePose
    from lib.models.vibe import VIBE

    torch.manual_seed(12)
    model = TePose(seqlen=S, n_layers=2, hidden_size=256, pretrained="")
    model.eval()
    model_vibe = VIBE(seqlen=16, n_layers=2, hidden_size=256,
                      add_linear=True, pretrained="")
    model_vibe.eval()

    rs = np.random.RandomState(21)
    F = 13  # frames -> 8 TePose windows after the VIBE bootstrap
    feats = rs.randn(F, 2048).astype(np.float32) * 0.2
    theta_pseu = rs.randn(S - 1, 85).astype(np.float32) * 0.2
    theta_gt = rs.randn(F, 85).astype(np.float32) * 0.2
    jreg = rs.rand(17, NUM_VERTS).astype(np.float32)
    jreg /= jreg.sum(axis=1, keepdims=True)

    gen_params = convert_torch_generator(model.state_dict())
    vibe_params = convert_torch_generator(model_vibe.state_dict(),
                                          has_vibe_encoder=True)
    model_cfg = TePoseConfig(seqlen=S, n_layers=2, hidden_size=256)
    vibe_cfg = VibeConfig(seqlen=16, n_layers=2, hidden_size=256,
                          add_linear=True)
    smpl = ref_env["smpl"]

    for use_jreg in (True, False):
        jreg_t = torch.from_numpy(jreg) if use_jreg else None
        ref_j3d, ref_theta, ref_verts = _reference_rollout(
            model, model_vibe, feats, theta_pseu, jreg_t)

        eval_fn = make_eval_scan(smpl, model_cfg, vibe_cfg,
                                 num_windows=F - S + 1,
                                 use_j_regressor=use_jreg)
        out = eval_fn(gen_params, vibe_params, jnp.asarray(feats[None]),
                      jnp.asarray(theta_pseu[None]),
                      jnp.asarray(theta_gt[None]), jnp.asarray(jreg))

        assert out["pred_theta"].shape == (1, F, 85)
        np.testing.assert_allclose(np.asarray(out["pred_theta"][0]),
                                   ref_theta, atol=3e-4)
        np.testing.assert_allclose(np.asarray(out["pred_j3d"][0]),
                                   ref_j3d, atol=3e-4)

        # our per-frame MPVPE must equal the torch-side rebuild: GT verts
        # from theta_gt (pose2rot) vs the rollout's predicted verts
        from lib.models.smpl import SMPL, SMPL_MODEL_DIR

        smpl_t = SMPL(SMPL_MODEL_DIR, batch_size=1, create_transl=False)
        with torch.no_grad():
            gt_out = smpl_t(
                betas=torch.from_numpy(theta_gt[:, 75:]),
                body_pose=torch.from_numpy(theta_gt[:, 6:75]),
                global_orient=torch.from_numpy(theta_gt[:, 3:6]),
                pose2rot=True)
        gt_verts = gt_out.vertices.numpy()
        ref_mpvpe = np.sqrt(
            ((ref_verts - gt_verts) ** 2).sum(-1)).mean(-1)
        np.testing.assert_allclose(np.asarray(out["mpvpe"][0]), ref_mpvpe,
                                   atol=3e-4)


def test_train_time_accel_metrics_parity(ref_env):
    """Validation accel metrics (video-masked normalisation quirks) vs the
    reference's own compute_accel / compute_error_accel
    (eval_utils.py:53-107)."""
    from lib.utils.eval_utils import compute_accel, compute_error_accel

    from tepose_tpu.eval.metrics import (
        accel_error_masked, accel_magnitude_masked)

    rs = np.random.RandomState(5)
    B, T, K, seqlen = 4, 20, 14, 6
    joints = rs.randn(B, T, K, 3).astype(np.float32)
    target = rs.randn(B, T, K, 3).astype(np.float32)
    vidlen = np.array([20, 14, 17, 9], np.float32)

    ref_mag = float(compute_accel(joints, torch.from_numpy(vidlen), seqlen))
    ref_err = float(compute_error_accel(target, joints,
                                        torch.from_numpy(vidlen), seqlen))

    np.testing.assert_allclose(
        accel_magnitude_masked(joints, vidlen, seqlen), ref_mag, rtol=1e-6)
    np.testing.assert_allclose(
        accel_error_masked(joints, target, vidlen, seqlen), ref_err,
        rtol=1e-6)


# ---------------------------------------------------------------------------
# Trainer-validation parity (ref: trainer.py:294-360 validate, :437-503
# evaluate) — the checkpoint-selection path, VERDICT r2 #4
# ---------------------------------------------------------------------------


def _reference_trainer_validate(model, batches, jreg_t, seqlen):
    """The reference Trainer.validate + evaluate loop, transcribed from
    trainer.py:294-360,437-503 with the real torch generator — including
    the GLOBAL per-video theta tensor indexed by target['index']
    (trainer.py:316-336), the row filter j < vidlen-S+1, and the
    time-index target "pelvis" quirk at trainer.py:469."""
    from lib.utils.eval_utils import (
        batch_compute_similarity_transform_torch,
        compute_accel,
        compute_error_accel,
        compute_error_verts,
    )

    S = seqlen
    acc = {k: [] for k in ("pred_verts", "target_theta", "pred_j3d",
                           "target_j3d", "pred_j3d_tsr", "target_j3d_tsr",
                           "vidlen_each")}
    n_total = sum(b["kp_2d"].shape[0] for b in batches)
    theta_input = None
    for i, target in enumerate(batches):
        acc["target_j3d_tsr"].append(target["kp_3d"])
        acc["vidlen_each"].append(target["vidlen_each"])
        B, T = target["kp_2d"].shape[:2]
        idx = target["index"].view(-1).long()
        for j in range(T - S + 1):
            if j == 0:
                if i == 0:
                    theta_input = torch.zeros((n_total, T, 85)).float()
                theta_input[idx, :S - 1, :] = target["theta_pseu"][:, :S - 1]
                pred_j3d_tsr = torch.zeros(
                    (B, T, target["kp_3d"].shape[2], 3)).float()
            with torch.no_grad():
                inp = torch.zeros((B, S, 2048 + 85)).float()
                inp[:, :, :2048] = target["features"][:, j:j + S, :]
                inp[:, :S - 1, 2048:] = theta_input[idx, j:j + S - 1, :]
                preds = model(inp, J_regressor=jreg_t)
                n_kp = preds[-1]["kp_3d"].shape[-2]
                pred_j3d = preds[-1]["kp_3d"].view(-1, n_kp, 3)
                target_j3d = target["kp_3d"][:, j + S - 1].view(-1, n_kp, 3)
                pred_verts = preds[-1]["verts"].view(-1, NUM_VERTS, 3)
                target_theta = target["theta"][:, j + S - 1].view(-1, 85)
                theta_input[idx, j + S - 1, :] = preds[-1]["theta"]

                sel = j < (target["vidlen_each"].view(-1) - S + 1)
                acc["pred_verts"].append(pred_verts[sel])
                acc["target_theta"].append(target_theta[sel])
                acc["pred_j3d"].append(pred_j3d[sel])
                acc["target_j3d"].append(target_j3d[sel])
                pred_j3d_tsr[:, j + S - 1, :, :] = pred_j3d
        acc["pred_j3d_tsr"].append(pred_j3d_tsr)

    # ---- Trainer.evaluate (trainer.py:437-503) ----------------------------
    acc = {k: torch.cat(v, dim=0) for k, v in acc.items()}
    pred_j3ds = acc["pred_j3d"]
    target_j3ds = acc["target_j3d"]
    pred_pelvis = (pred_j3ds[:, [2], :] + pred_j3ds[:, [3], :]) / 2.0
    target_pelvis = (target_j3ds[:, [2], :] + target_j3ds[:, [3], :]) / 2.0
    pred_j3ds = pred_j3ds - pred_pelvis
    target_j3ds = target_j3ds - target_pelvis
    errors = torch.sqrt(((pred_j3ds - target_j3ds) ** 2).sum(dim=-1)) \
        .mean(dim=-1).numpy()
    S1_hat = batch_compute_similarity_transform_torch(pred_j3ds,
                                                      target_j3ds)
    errors_pa = torch.sqrt(((S1_hat - target_j3ds) ** 2).sum(dim=-1)) \
        .mean(dim=-1).numpy()

    m2mm = 1000
    vidlen_each = acc["vidlen_each"]
    pred_j3ds_tsr = acc["pred_j3d_tsr"].clone()
    target_j3ds_tsr = acc["target_j3d_tsr"].clone()
    pred_pelvis_tsr = (pred_j3ds_tsr[:, :, [2], :]
                       + pred_j3ds_tsr[:, :, [3], :]) / 2.0
    # the reference's time-index target quirk, trainer.py:469, verbatim
    target_pelvis_tsr = (target_j3ds_tsr[:, [2], :]
                         + target_j3ds_tsr[:, [3], :]) / 2.0
    pred_j3ds_tsr = pred_j3ds_tsr - pred_pelvis_tsr
    target_j3ds_tsr = target_j3ds_tsr - target_pelvis_tsr

    accel = compute_accel(pred_j3ds_tsr, vidlen_each, S) * m2mm
    accel_err = compute_error_accel(
        joints_pred=pred_j3ds_tsr, joints_gt=target_j3ds_tsr,
        vidlen_each=vidlen_each, seqlen=S) * m2mm
    pve = np.mean(compute_error_verts(
        target_theta=acc["target_theta"],
        pred_verts=acc["pred_verts"])) * m2mm
    return {
        "mpjpe": float(np.mean(errors) * m2mm),
        "pa-mpjpe": float(np.mean(errors_pa) * m2mm),
        "accel": float(accel),
        "accel_err": float(accel_err),
        "pve": float(pve),
    }


def test_trainer_validate_parity(ref_env):
    """Our validate_epoch (the checkpoint-selection metrics) must match the
    reference Trainer.validate/evaluate run with the real torch generator
    over 2 batches of ragged-length videos — including the global-index
    theta tensor semantics and every metric in the dict."""
    from lib.models.tepose import TePose

    from tepose_tpu.train.validate import validate_epoch

    torch.manual_seed(17)
    model = TePose(seqlen=S, n_layers=2, hidden_size=256, pretrained="")
    model.eval()

    rs = np.random.RandomState(23)
    B, T, K = 3, 13, 14
    jreg = rs.rand(17, NUM_VERTS).astype(np.float32)
    jreg /= jreg.sum(axis=1, keepdims=True)
    vidlens = [np.array([13, 9, 11], np.float32),
               np.array([13, 7, 12], np.float32)]

    batches_np = []
    for bi, vl in enumerate(vidlens):
        batches_np.append({
            "features": rs.randn(B, T, 2048).astype(np.float32) * 0.2,
            "theta_pseu": rs.randn(B, T, 85).astype(np.float32) * 0.2,
            "kp_2d": np.zeros((B, T, 49, 3), np.float32),  # shape carrier
            "kp_3d": rs.randn(B, T, K, 3).astype(np.float32) * 0.3,
            "theta": rs.randn(B, T, 85).astype(np.float32) * 0.2,
            "vidlen_each": vl,
            "index": np.arange(bi * B, (bi + 1) * B, dtype=np.int64),
        })

    t = torch.from_numpy
    ref = _reference_trainer_validate(
        model, [{k: t(v) for k, v in b.items()} for b in batches_np],
        t(jreg), S)

    gen_params = convert_torch_generator(model.state_dict())
    model_cfg = TePoseConfig(seqlen=S, n_layers=2, hidden_size=256)
    ours = validate_epoch(gen_params, ref_env["smpl"], model_cfg,
                          batches_np, jreg, seqlen=S)

    for key in ("mpjpe", "pa-mpjpe", "accel", "accel_err", "pve"):
        np.testing.assert_allclose(ours[key], ref[key], rtol=2e-4,
                                   err_msg=key)


# ---------------------------------------------------------------------------
# File-level checkpoint conversion dress rehearsal (VERDICT r2 #5)
# ref: trainer.py:392-401 (save layout), lib/utils/utils.py:40-45 (module.)
# ---------------------------------------------------------------------------


def test_checkpoint_file_conversion_rehearsal(ref_env, tmp_path, monkeypatch):
    """torch.save a reference-layout .pth.tar (real TePose + GCN state
    dicts, performance/epoch, plus a DataParallel 'module.'-prefixed twin),
    drive tools/convert_checkpoint.py's CLI on both files, load the npz via
    the same load_checkpoint evaluate.py:build_models uses, and pin the
    eval rollout of the converted weights against the torch rollout."""
    import sys

    from lib.models.motion_discriminator_gcn import MotionDiscriminatorGCN
    from lib.models.tepose import TePose
    from lib.models.vibe import VIBE

    import tools.convert_checkpoint as cc
    from tepose_tpu.train.checkpoint import load_checkpoint

    torch.manual_seed(33)
    model = TePose(seqlen=S, n_layers=2, hidden_size=256, pretrained="")
    model.eval()
    disc = MotionDiscriminatorGCN(
        num_class=2, num_point=24, num_person=1, num_gcn_scales=13,
        num_g3d_scales=6, graph="lib.graph.smplx_theta.AdjMatrixGraph")

    # the exact save layout of Trainer.save_model (trainer.py:392-401);
    # optimizer/scheduler states present but ignored by the converter
    save_dict = {
        "epoch": 7,
        "gen_state_dict": model.state_dict(),
        "performance": 52.25,
        "lr_scheduler": {"factor": 0.1},
        "gen_optimizer": {"state": {}},
        "disc_motion_state_dict": disc.state_dict(),
        "disc_motion_optimizer": {"state": {}},
    }
    src = tmp_path / "checkpoint.pth.tar"
    torch.save(save_dict, str(src))
    # DataParallel twin: every weight key prefixed with 'module.'
    dp_dict = dict(save_dict)
    dp_dict["gen_state_dict"] = {
        "module." + k: v for k, v in model.state_dict().items()}
    dp_dict["disc_motion_state_dict"] = {
        "module." + k: v for k, v in disc.state_dict().items()}
    src_dp = tmp_path / "checkpoint_dp.pth.tar"
    torch.save(dp_dict, str(src_dp))

    outs = {}
    for name, path in (("plain", src), ("dp", src_dp)):
        dst = tmp_path / f"{name}.npz"
        monkeypatch.setattr(sys, "argv", [
            "convert_checkpoint.py", str(path), str(dst),
            "--kind", "tepose"])
        cc.main()
        outs[name] = load_checkpoint(str(dst))

    trees, scalars = outs["plain"]
    assert scalars["epoch"] == 7 and scalars["performance"] == 52.25
    assert set(trees) >= {"gen", "disc", "disc_state"}

    # module.-prefixed file converts to byte-identical trees
    dp_trees, _ = outs["dp"]
    flat_a = jax.tree_util.tree_leaves_with_path(trees["gen"])
    flat_b = jax.tree_util.tree_leaves_with_path(dp_trees["gen"])
    assert len(flat_a) == len(flat_b) > 20
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    # the converted-file weights drive the eval rollout to the same numbers
    # as the torch modules themselves (the exact path a released checkpoint
    # takes through evaluate.py:build_models -> make_eval_scan)
    torch.manual_seed(34)
    model_vibe = VIBE(seqlen=16, n_layers=2, hidden_size=256,
                      add_linear=True, pretrained="")
    model_vibe.eval()
    vibe_params = convert_torch_generator(model_vibe.state_dict(),
                                          has_vibe_encoder=True)

    rs = np.random.RandomState(41)
    F = 11
    feats = rs.randn(F, 2048).astype(np.float32) * 0.2
    theta_pseu = rs.randn(S - 1, 85).astype(np.float32) * 0.2
    theta_gt = rs.randn(F, 85).astype(np.float32) * 0.2

    ref_j3d, ref_theta, _ = _reference_rollout(
        model, model_vibe, feats, theta_pseu, None)

    eval_fn = make_eval_scan(ref_env["smpl"],
                             TePoseConfig(seqlen=S, n_layers=2,
                                          hidden_size=256),
                             VibeConfig(seqlen=16, n_layers=2,
                                        hidden_size=256, add_linear=True),
                             num_windows=F - S + 1, use_j_regressor=False)
    out = eval_fn(trees["gen"], vibe_params, jnp.asarray(feats[None]),
                  jnp.asarray(theta_pseu[None]),
                  jnp.asarray(theta_gt[None]),
                  jnp.zeros((17, NUM_VERTS), jnp.float32))
    np.testing.assert_allclose(np.asarray(out["pred_theta"][0]), ref_theta,
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["pred_j3d"][0]), ref_j3d,
                               atol=3e-4)

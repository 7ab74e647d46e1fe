"""Per-epoch validation: theta-feedback scan + trainer-eval metrics.

ref: lib/core/trainer.py:294-360 (validate) and :437-503 (evaluate). Unlike
benchmark eval (eval.evaluator), trainer validation has NO VIBE bootstrap:
the theta buffer starts from pseudo-thetas and only frames seqlen-1..T-1 get
predictions; metrics are masked to each video's true window range and the
accel metrics use the window-boundary-excluding normalisations
(eval.metrics.accel_*_masked).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from tepose_tpu.eval import metrics as M
from tepose_tpu.models.smpl import SmplModel, smpl_forward
from tepose_tpu.models.tepose import TePoseConfig, tepose_apply


def make_validate_scan(smpl: SmplModel, model_cfg: TePoseConfig,
                       num_windows: int):
    """Jitted validation scan for videos padded to T = num_windows + S - 1.

    Returns fn(gen_params, feats (B,T,2048), theta_pseu (B,S-1,85),
               theta_gt (B,T,85), j_regressor (17,V))
      -> dict pred_j3d (B,W,14,3), pve (B,W) per-window-frame vertex error.
    """
    S = model_cfg.seqlen

    def fn(gen_params, feats, theta_pseu, theta_gt, j_regressor):
        def step(theta_buf, k):
            win = jax.lax.dynamic_slice_in_dim(feats, k, S, axis=1)
            fb = jnp.concatenate(
                [theta_buf, jnp.zeros_like(theta_buf[:, :1])], axis=1)
            out = tepose_apply(gen_params, smpl,
                               jnp.concatenate([win, fb], -1), model_cfg,
                               j_regressor=j_regressor)
            theta = out["theta"]
            th_gt = jax.lax.dynamic_index_in_dim(theta_gt, k + S - 1, axis=1,
                                                 keepdims=False)
            gt_verts = smpl_forward(smpl, th_gt[:, 75:], th_gt[:, 3:75],
                                    pose2rot=True)["verts"]
            pve = jnp.sqrt(
                ((out["verts"] - gt_verts) ** 2).sum(-1)).mean(-1)
            new_buf = jnp.concatenate([theta_buf[:, 1:], theta[:, None]], 1)
            return new_buf, (out["kp_3d"], pve)

        _, (j3d, pve) = jax.lax.scan(step, theta_pseu,
                                     jnp.arange(num_windows))
        return {"pred_j3d": jnp.swapaxes(j3d, 0, 1),
                "pve": jnp.swapaxes(pve, 0, 1)}

    return jax.jit(fn)


def validate_epoch(gen_params, smpl, model_cfg: TePoseConfig, valid_loader,
                   j_regressor: np.ndarray, seqlen: int,
                   max_batches: int = 10**9) -> Dict[str, float]:
    """Run trainer-style validation and compute the epoch metrics.

    ref: trainer.py:437-503 — MPJPE/PA-MPJPE over valid window frames,
    accel/accel_err with masked normalisation, PVE vs GT-theta SMPL rebuild.
    Returns the metric dict; 'pa-mpjpe' is the checkpoint-selection metric.
    """
    S = seqlen
    fns = {}
    jreg = jnp.asarray(j_regressor)

    pred_list, tgt_list = [], []
    pve_list = []
    pred_tsr, tgt_tsr, vlens = [], [], []

    batches = 0
    for batch in valid_loader:
        feats = batch["features"]
        B, T = feats.shape[:2]
        W = T - S + 1
        if W not in fns:
            fns[W] = make_validate_scan(smpl, model_cfg, W)
        out = fns[W](gen_params, jnp.asarray(feats),
                     jnp.asarray(batch["theta_pseu"][:, :S - 1]),
                     jnp.asarray(batch["theta"]), jreg)
        pred_j3d = np.asarray(out["pred_j3d"])     # (B, W, 14, 3)
        pve = np.asarray(out["pve"])
        tgt_j3d = batch["kp_3d"]                   # (B, T, 14, 3)
        vl = batch["vidlen_each"].reshape(-1)

        for b in range(B):
            n_valid = int(max(0, min(W, vl[b] - S + 1)))
            pred_list.append(pred_j3d[b, :n_valid])
            tgt_list.append(tgt_j3d[b, S - 1:S - 1 + n_valid])
            pve_list.append(pve[b, :n_valid])

        # padded (B, T, ...) tracks for the accel metrics
        # (ref: trainer.py:344,357: predictions written at frame j+S-1)
        p_tsr = np.zeros((B, T) + pred_j3d.shape[2:], np.float32)
        p_tsr[:, S - 1:] = pred_j3d
        pred_tsr.append(p_tsr)
        tgt_tsr.append(np.asarray(tgt_j3d, np.float32))
        vlens.append(np.asarray(vl, np.float32))

        batches += 1
        if batches >= max_batches:
            break

    pred = np.concatenate(pred_list, axis=0)
    tgt = np.concatenate(tgt_list, axis=0).astype(np.float32)

    # pelvis align (common-format joints 2,3; ref: trainer.py:449-453)
    pred = pred - (pred[:, [2]] + pred[:, [3]]) / 2.0
    tgt = tgt - (tgt[:, [2]] + tgt[:, [3]]) / 2.0

    m2mm = 1000.0
    errs, errs_pa = M.host_joint_errors(pred, tgt)

    # accel over the padded per-video tracks
    T_max = max(p.shape[1] for p in pred_tsr)

    def pad_T(x):
        out = np.zeros((x.shape[0], T_max) + x.shape[2:], np.float32)
        out[:, :x.shape[1]] = x
        return out

    p_all = np.concatenate([pad_T(p) for p in pred_tsr], axis=0)
    t_all = np.concatenate([pad_T(t) for t in tgt_tsr], axis=0)
    v_all = np.concatenate(vlens, axis=0)
    p_all = p_all - (p_all[:, :, [2]] + p_all[:, :, [3]]) / 2.0
    # ref trainer.py:469 "aligns" the target tensor with TIME indices
    # [2],[3] (not the pelvis joints) — a time-constant per-joint offset
    # that cancels in the accel second difference. Replicated literally so
    # accel_err matches the reference's checkpoint-selection numbers
    # (pinned in tests/test_reference_eval_parity.py).
    t_all = t_all - (t_all[:, [2]] + t_all[:, [3]]) / 2.0

    accel = M.accel_magnitude_masked(p_all, v_all, S) * m2mm
    accel_err = M.accel_error_masked(p_all, t_all, v_all, S) * m2mm
    pve = float(np.mean(np.concatenate(pve_list))) * m2mm

    return {
        "mpjpe": float(errs.mean()) * m2mm,
        "pa-mpjpe": float(errs_pa.mean()) * m2mm,
        "accel": float(accel),
        "accel_err": float(accel_err),
        "pve": pve,
    }

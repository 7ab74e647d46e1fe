"""TePose: the flagship causal sliding-window video-to-SMPL model.

ref: lib/models/tepose.py:90-147. Input windows are (B, T=seqlen, 2133) where
2133 = 2048 image features + 85-dim theta feedback from previous predictions.
The dual-GRU encoder collapses the window to per-window feature(s); the IEF
regressor + SMPL layer produce theta/verts/joints for the window's LAST frame
(causal, unlike TCMR's mid-frame).

Functional API:
  cfg     = TePoseConfig(seqlen=6, n_layers=2, hidden_size=1024)
  params  = tepose_init(rng, cfg)
  out     = tepose_apply(params, smpl, x, cfg, train=..., j_regressor=...)

Eval out: dict of (B, ...) tensors for the last frame.
Train out: dict of (B, 2, ...) tensors — the "fwd" and "rec" encoder branches
as 2 repeats (ref: tepose.py:138-145).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tepose_tpu.models.regressor import regressor_init, regressor_apply
from tepose_tpu.models.smpl import SmplModel
from tepose_tpu.models.temporal import (
    INPUT_DIM,
    temporal_encoder_init,
    temporal_encoder_apply,
    vibe_encoder_init,
    vibe_encoder_apply,
)


@dataclasses.dataclass(frozen=True)
class TePoseConfig:
    """Static hyperparameters (ref: configs/repr_*.yaml MODEL.TGRU).

    `fast_encoder` routes the forward through models.fast_encoder (lane-
    batched GRUs, numerically equivalent — see that module's measurements);
    best at small/medium batch, which includes the training batch of 32.
    """

    seqlen: int = 6
    n_layers: int = 2
    hidden_size: int = 1024
    fast_encoder: bool = False


def tepose_init(rng: jax.Array, cfg: TePoseConfig,
                mean_params: Optional[dict] = None) -> Dict:
    k_enc, k_reg = jax.random.split(rng)
    return {
        "encoder": temporal_encoder_init(
            k_enc, cfg.n_layers, cfg.hidden_size, INPUT_DIM),
        "regressor": regressor_init(k_reg, mean_params),
    }


def tepose_apply(
    params: Dict,
    smpl: SmplModel,
    x: jnp.ndarray,
    cfg: TePoseConfig,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    j_regressor: Optional[jnp.ndarray] = None,
    compute_verts: bool = True,
) -> Dict[str, jnp.ndarray]:
    """x: (B, T, 2133) -> dict of predictions for the window's last frame.

    Eval shapes: theta (B, 85), verts (B, V, 3), kp_2d (B, K, 2),
    kp_3d (B, K, 3), rotmat (B, 24, 3, 3).
    Train shapes have an extra repeat axis of 2 after batch.
    compute_verts=False drops "verts" and uses the vertex-free joint path
    (models.smpl.smpl_joints_reduced) — the training step's choice.
    """
    B = x.shape[0]
    if cfg.fast_encoder:
        from tepose_tpu.models.fast_encoder import (
            fast_encoder_window, pack_fast_encoder, project_frame_features)

        fast = pack_fast_encoder(params["encoder"], cfg.n_layers)
        proj = project_frame_features(fast, x[..., :2048])
        feature = fast_encoder_window(fast, proj, x[..., 2048:], train=train)
    else:
        feature = temporal_encoder_apply(params["encoder"], x, cfg.n_layers,
                                         train=train)
    feature = feature.reshape(-1, feature.shape[-1])  # (B | 2B, 2048)

    out = regressor_apply(params["regressor"], smpl, feature, train=train,
                          rng=rng, j_regressor=j_regressor,
                          compute_verts=compute_verts)

    if train:
        # (B*2, ...) -> (B, 2, ...)
        out = {k: v.reshape((B, 2) + v.shape[1:]) for k, v in out.items()}
    return out


# ---------------------------------------------------------------- VIBE


@dataclasses.dataclass(frozen=True)
class VibeConfig:
    """ref: evaluate.py:89-98 — the bootstrap VIBE uses n_layers=2,
    hidden 1024, add_linear=True, unidirectional, residual."""

    seqlen: int = 16
    n_layers: int = 2
    hidden_size: int = 1024
    add_linear: bool = True
    bidirectional: bool = False
    use_residual: bool = True


def vibe_init(rng: jax.Array, cfg: VibeConfig,
              mean_params: Optional[dict] = None) -> Dict:
    k_enc, k_reg = jax.random.split(rng)
    return {
        "encoder": vibe_encoder_init(
            k_enc, cfg.n_layers, cfg.hidden_size, cfg.add_linear,
            cfg.bidirectional),
        "regressor": regressor_init(k_reg, mean_params),
    }


def vibe_apply(
    params: Dict,
    smpl: SmplModel,
    x: jnp.ndarray,
    cfg: VibeConfig,
    *,
    j_regressor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """x: (B, T, 2048) -> dict of per-frame predictions (B, T, ...).

    ref: vibe.py:102-117 — VIBE predicts every frame of the window.
    """
    B, T = x.shape[:2]
    feature = vibe_encoder_apply(params["encoder"], x, cfg.n_layers,
                                 cfg.bidirectional, cfg.use_residual)
    feature = feature.reshape(B * T, -1)
    out = regressor_apply(params["regressor"], smpl, feature,
                          j_regressor=j_regressor)
    return {k: v.reshape((B, T) + v.shape[1:]) for k, v in out.items()}


def vibe_demo_apply(
    params: Dict,
    backbone_params: Dict,
    smpl: SmplModel,
    images: jnp.ndarray,
    cfg: VibeConfig,
    *,
    j_regressor=None,
) -> Dict[str, jnp.ndarray]:
    """VIBE over ImageNet-NORMALISED image crops: inline ResNet-50 feature
    extraction first (normalise with backbone.normalize_crop beforehand —
    raw [0,255] pixels would silently produce garbage features).

    ref: vibe.py:120-179 (VIBE_Demo.forward). images (B, T, 3, 224, 224).
    """
    from tepose_tpu.models.backbone import resnet50_features

    B, T = images.shape[:2]
    feats = resnet50_features(
        backbone_params, images.reshape((B * T,) + images.shape[2:]))
    return vibe_apply(params, smpl, feats.reshape(B, T, -1), cfg,
                      j_regressor=j_regressor)

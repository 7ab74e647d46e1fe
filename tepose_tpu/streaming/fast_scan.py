"""Optimised streaming scan built on the lane-batched fast encoder.

Equivalent to the plain tepose_apply window scan (tested). Measured on a
v5e chip:

  96 windows  (early):  plain B=64:  37.5k FPS   fast B=64: 123.9k FPS
  480 windows (bench.py, 2026-08): plain B=256: 135.9k FPS
                                   fast  B=256: 190.5k FPS
  + precomputed frame projections (2026-08):    229.6k FPS

i.e. the lane-batched encoder wins at small batch (per-tracklet demo
latency) AND, on long segments, at large batch — bench.py measures both
every run and takes the better one, so trust BENCH_r*.json over any static
table here. Two projection-hoisting designs were measured: CARRYING the
(B, S, 3, 3H) window projections in the scan carry was slower at every
batch size (carry HBM round trips beat the matmul savings), but
PRECOMPUTING all T frames' projections once outside the scan — one large
MXU-efficient matmul, sliced per window — is ~1.23x faster at B=256 with
bit-identical outputs, and is the default whenever the (B, T, 3, 3H)
tensor fits the memory budget below.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tepose_tpu.models.fast_encoder import (
    fast_encoder_window, pack_fast_encoder, project_frame_features)
from tepose_tpu.models.regressor import regressor_apply
from tepose_tpu.models.smpl import SmplModel
from tepose_tpu.models.tepose import TePoseConfig


# precomputing every frame's layer-0 projection materialises a
# (B, T, 3, 3H) f32 tensor; above this budget fall back to per-window
# recompute (the sliding windows overlap S-fold, so precompute saves ~S x
# the layer-0 matmul FLOPs: measured 187k -> 230k fps at B=256/T=485 on
# v5e, bit-identical outputs)
PRECOMPUTE_PROJ_BYTES = 6 << 30

# Why no Pallas fused window-step kernel: the theta feedback makes the scan
# serial per stream, so each step must re-read the recurrent weights
# (~75 MB f32 of hidden projections across lanes/layers — far over the
# ~16 MB/core VMEM), putting a weight-streaming floor of ~90 us/step on ANY
# implementation; at large B the measured step is compute-bound near the
# MXU roofline already, and at small B the gap to that floor is what a
# kernel could recover — not worth the complexity at ~2,000x the realtime
# target. The wins that did pay are algorithmic: lane-batching
# (fast_encoder) and hoisting the frame projections (above).


def fast_stream_scan(
    gen_params: Dict,
    smpl: SmplModel,
    feats: jnp.ndarray,
    theta_buf0: jnp.ndarray,
    cfg: TePoseConfig,
    num_windows: int,
    j_regressor: Optional[jnp.ndarray] = None,
    outputs: Tuple[str, ...] = ("theta", "kp_3d"),
    precompute_projections: Optional[bool] = None,
):
    """Run the theta-feedback stream over `num_windows` windows.

    feats (B, T, 2048); theta_buf0 (B, S-1, 85). Returns a dict of stacked
    per-window outputs, each (B, W, ...), for the keys in `outputs`.

    `precompute_projections` projects every frame once outside the scan
    (one big MXU-efficient matmul) instead of re-projecting each frame in
    every window that contains it; None = auto by memory budget.
    """
    S = cfg.seqlen
    fast = pack_fast_encoder(gen_params["encoder"], cfg.n_layers)

    B, T = feats.shape[:2]
    if num_windows > T - S + 1:
        # dynamic_slice CLAMPS out-of-range starts, so an inconsistent
        # caller would silently duplicate the last window instead of
        # failing — make it loud (both values are static at trace time)
        raise ValueError(
            f"num_windows={num_windows} > T-S+1={T - S + 1} "
            f"(T={T}, seqlen={S})")
    n_lanes, lane_dim = fast["layers"][0]["w_feat"].shape[:2]
    if precompute_projections is None:
        precompute_projections = (
            B * T * n_lanes * lane_dim * 4 <= PRECOMPUTE_PROJ_BYTES)
    all_proj = (project_frame_features(fast, feats)
                if precompute_projections else None)

    def step(theta_buf, k):
        if all_proj is not None:
            proj = jax.lax.dynamic_slice_in_dim(all_proj, k, S, axis=1)
        else:
            win = jax.lax.dynamic_slice_in_dim(feats, k, S, axis=1)
            proj = project_frame_features(fast, win)             # (B,S,3,3H)
        thetas = jnp.concatenate(
            [theta_buf, jnp.zeros_like(theta_buf[:, :1])], axis=1)

        feature = fast_encoder_window(fast, proj, thetas)
        out = regressor_apply(gen_params["regressor"], smpl, feature,
                              j_regressor=j_regressor)
        theta = out["theta"]
        new_buf = jnp.concatenate([theta_buf[:, 1:], theta[:, None]], axis=1)
        return new_buf, tuple(out[k_] for k_ in outputs)

    _, ys = jax.lax.scan(step, theta_buf0, jnp.arange(num_windows))
    return {k_: jnp.swapaxes(v, 0, 1) for k_, v in zip(outputs, ys)}

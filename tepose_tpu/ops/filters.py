"""Temporal smoothing filters: 1-euro pose filter and bbox smoothing.

ref: lib/utils/one_euro_filter.py (1-euro low-pass), lib/utils/smooth_pose.py
(pose smoothing wrapper that re-runs SMPL), lib/utils/smooth_bbox.py
(kp->bbox params, missing-detection interpolation, median+gaussian filter).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.ndimage import gaussian_filter1d
from scipy.signal import medfilt


# ---------------------------------------------------------------- one-euro


def _smoothing_factor(t_e: np.ndarray, cutoff) -> np.ndarray:
    r = 2 * np.pi * cutoff * t_e
    return r / (r + 1)


def _exp_smooth(a, x, x_prev):
    return a * x + (1 - a) * x_prev


class OneEuroFilter:
    """Vectorised 1-euro filter (Casiez et al.); ref: one_euro_filter.py:5-46.

    Operates elementwise on arrays of any shape.
    """

    def __init__(self, t0: float, x0: np.ndarray, dx0: float = 0.0,
                 min_cutoff: float = 1.0, beta: float = 0.0,
                 d_cutoff: float = 1.0):
        self.min_cutoff = float(min_cutoff)
        self.beta = float(beta)
        self.d_cutoff = float(d_cutoff)
        self.x_prev = np.asarray(x0, np.float64)
        self.dx_prev = np.full_like(self.x_prev, dx0)
        self.t_prev = float(t0)

    def __call__(self, t: float, x: np.ndarray) -> np.ndarray:
        t_e = t - self.t_prev
        a_d = _smoothing_factor(t_e, self.d_cutoff)
        dx = (np.asarray(x, np.float64) - self.x_prev) / t_e
        dx_hat = _exp_smooth(a_d, dx, self.dx_prev)

        cutoff = self.min_cutoff + self.beta * np.abs(dx_hat)
        a = _smoothing_factor(t_e, cutoff)
        x_hat = _exp_smooth(a, x, self.x_prev)

        self.x_prev = x_hat
        self.dx_prev = dx_hat
        self.t_prev = t
        return x_hat


def smooth_pose_params(pred_pose: np.ndarray, pred_betas: np.ndarray,
                       min_cutoff: float = 0.004, beta: float = 0.7):
    """1-euro-filter a (T, 72) pose + (T, 10) betas track.

    Returns the smoothed tracks; the caller re-runs SMPL to refresh
    verts/joints (ref: smooth_pose.py:24-68 — the demo --smooth path).
    """
    pose = pred_pose.copy()
    betas = pred_betas.copy()
    f_pose = OneEuroFilter(0, pose[0], min_cutoff=min_cutoff, beta=beta)
    f_beta = OneEuroFilter(0, betas[0], min_cutoff=min_cutoff, beta=beta)
    for t in range(1, len(pose)):
        pose[t] = f_pose(t, pose[t])
        betas[t] = f_beta(t, betas[t])
    return pose, betas


# ---------------------------------------------------------------- bbox


def kp_to_bbox_param(kp: np.ndarray, vis_thresh: float = 0.3,
                     person_height: float = 150.0) -> Optional[np.ndarray]:
    """Keypoints (K, 3) -> (cx, cy, scale) with 150px-person scaling.

    ref: smooth_bbox.py:36-59 (get_bbox_params equivalent).
    """
    vis = kp[:, 2] > vis_thresh
    if not np.any(vis):
        return None
    pts = kp[vis, :2]
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    center = (lo + hi) / 2.0
    height = float((hi - lo).max())
    if height <= 0:
        return None
    scale = person_height / height
    return np.array([center[0], center[1], scale], np.float32)


def interpolate_missing(params: np.ndarray,
                        present: np.ndarray) -> np.ndarray:
    """Linearly interpolate bbox params over missing detections.

    ref: smooth_bbox.py:62-103. params (T, 3); present (T,) bool.
    """
    out = params.copy()
    idx = np.flatnonzero(present)
    if len(idx) == 0:
        return out
    for c in range(params.shape[1]):
        out[:, c] = np.interp(np.arange(len(params)), idx, params[idx, c])
    return out


def smooth_bbox_params(params: np.ndarray, kernel_size: int = 11,
                       sigma: float = 8.0) -> np.ndarray:
    """Median + gaussian filter over (T, 3) bbox params
    (ref: smooth_bbox.py:106-121)."""
    k = kernel_size if kernel_size % 2 == 1 else kernel_size + 1
    k = min(k, len(params) if len(params) % 2 == 1 else len(params) - 1)
    out = params.copy().astype(np.float64)
    if k >= 3:
        for c in range(params.shape[1]):
            out[:, c] = medfilt(out[:, c], k)
    for c in range(params.shape[1]):
        out[:, c] = gaussian_filter1d(out[:, c], sigma)
    return out.astype(np.float32)


def get_smooth_bbox_params(kps: np.ndarray, vis_thresh: float = 0.3,
                           kernel_size: int = 11,
                           sigma: float = 8.0) -> Tuple[np.ndarray, np.ndarray]:
    """Full pipeline: per-frame kp->bbox, interpolate gaps, smooth.

    kps (T, K, 3) -> (bbox_params (T, 3), present mask (T,)).
    ref: smooth_bbox.py:9-121.
    """
    T = len(kps)
    params = np.zeros((T, 3), np.float32)
    present = np.zeros(T, bool)
    for t in range(T):
        p = kp_to_bbox_param(kps[t], vis_thresh)
        if p is not None:
            params[t] = p
            present[t] = True
    params = interpolate_missing(params, present)
    params = smooth_bbox_params(params, kernel_size, sigma)
    return params, present

"""Training/debug visualisation: skeleton and mesh overlays, video grids.

ref: lib/utils/vis.py (batch_visualize_vid_preds at :330-382 used by the
trainer's DEBUG path, draw_skeleton at :384-414). Rendering uses the native
rasterizer (tepose_tpu.native) instead of pyrender.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


# skeleton edges for the 49-joint spin format (subset: the 14 common joints,
# ref: _kp_utils.py get_spin_skeleton / get_common_skeleton)
COMMON_SKELETON = [
    (0, 1), (1, 2), (3, 4), (4, 5), (6, 7), (7, 8), (8, 2), (8, 9), (9, 3),
    (2, 3), (8, 12), (9, 10), (12, 9), (10, 11), (12, 13),
]


def draw_skeleton(image: np.ndarray, kp_2d: np.ndarray,
                  unnormalize: bool = True, thickness: int = 2,
                  radius: int = 3) -> np.ndarray:
    """Draw a 2D skeleton over an image (in place; returns image).

    kp_2d (K, 2|3) — normalised [-1,1] when `unnormalize` (model outputs) or
    pixel coords otherwise. Uses the common-14 subset when K == 49.
    """
    import cv2

    kp = kp_2d.copy().astype(np.float32)
    if unnormalize:
        # per-axis: x scales by width, y by height (identical on the
        # square 224-crops, wrong on full frames otherwise)
        kp[:, 0] = (kp[:, 0] + 1.0) * 0.5 * image.shape[1]
        kp[:, 1] = (kp[:, 1] + 1.0) * 0.5 * image.shape[0]
    if kp.shape[0] == 49:
        kp = kp[25:39]
    pts = kp[:, :2].astype(int)
    conf = kp[:, 2] if kp.shape[1] > 2 else np.ones(len(kp))
    for a, b in COMMON_SKELETON:
        if a < len(pts) and b < len(pts) and conf[a] > 0 and conf[b] > 0:
            cv2.line(image, tuple(pts[a]), tuple(pts[b]), (0, 255, 120),
                     thickness)
    for i, p in enumerate(pts):
        if conf[i] > 0:
            cv2.circle(image, tuple(p), radius, (255, 128, 0), -1)
    return image


def overlay_mesh_on_crop(crop: np.ndarray, verts: np.ndarray,
                         cam: np.ndarray, faces: np.ndarray,
                         color=(1.0, 1.0, 0.9)) -> np.ndarray:
    """Render a mesh over a square crop using its weak-perspective cam
    (s, tx, ty) — crop-coordinate equivalent of the demo overlay."""
    from tepose_tpu.native import render_mesh

    cam4 = np.array([cam[0], cam[0], cam[1], cam[2]], np.float32)
    return render_mesh(verts, faces, cam4, crop.copy(), color=color)


def batch_visualize_vid_preds(video: np.ndarray, preds: Dict,
                              target: Dict, faces: Optional[np.ndarray],
                              max_items: int = 4) -> np.ndarray:
    """Build a (T, H, W*min(B, max_items), 3) one-row prediction-overlay
    video grid for a batch.

    ref: vis.py:330-382 — per sample: input crop (+ mesh when faces given)
    + predicted skeleton + GT skeleton. The mesh is rendered FIRST so the
    near-opaque overlay cannot hide the skeletons drawn on top. video
    (B, T, H, W, 3) uint8; preds with kp_2d (B, T, K, 2) and optionally
    verts/theta.
    """
    B, T = video.shape[:2]
    n = min(B, max_items)
    frames = []
    for t in range(T):
        row = []
        for b in range(n):
            img = video[b, t].copy()
            if faces is not None and "verts" in preds and "theta" in preds:
                cam = np.asarray(preds["theta"][b, t, :3])
                img = overlay_mesh_on_crop(
                    img, np.asarray(preds["verts"][b, t]), cam, faces)
            if "kp_2d" in preds:
                draw_skeleton(img, np.asarray(preds["kp_2d"][b, t]))
            if "kp_2d" in target:
                draw_skeleton(img, np.asarray(target["kp_2d"][b, t]),
                              thickness=1, radius=2)
            row.append(img)
        frames.append(np.concatenate(row, axis=1))
    return np.stack(frames)


def draw_wireframe(image: np.ndarray, verts: np.ndarray, cam: np.ndarray,
                   faces: np.ndarray, color=(200, 200, 180),
                   max_edges: int = 20000) -> np.ndarray:
    """Edge-line mesh overlay (the --wireframe demo flag; the reference
    delegates to pyrender's wireframe mode, renderer.py/demo.py:482).

    cam (4,) = (sx, sy, tx, ty) in original-image coords (same mapping as the
    native rasterizer).
    """
    import cv2

    h, w = image.shape[:2]
    sx, sy, tx, ty = [float(c) for c in cam]
    px = ((1.0 + sx * (verts[:, 0] + tx)) * 0.5 * w).astype(np.int32)
    py = ((1.0 + sy * (-verts[:, 1] + ty)) * 0.5 * h).astype(np.int32)
    edges = set()
    for f in faces[:max_edges]:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            edges.add((min(a, b), max(a, b)))
    for a, b in edges:
        cv2.line(image, (px[a], py[a]), (px[b], py[b]), color, 1)
    return image

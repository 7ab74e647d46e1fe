#!/usr/bin/env python
"""Generate the golden-image fixtures for the native rasterizer tests.

Deterministic scenes (UV spheres — smooth shading gradients, occlusion and
projection are all visible on them) rendered through `native.render_mesh`
and committed as PNGs under tests/golden/. The tests
(tests/test_render_golden.py) re-render each scene and assert pixel/SSIM
tolerance, so a z-buffer, projection, normal or lighting regression fails CI
(VERDICT r3 #5; ref: lib/utils/renderer.py:36-121).

Regenerate (after an INTENTIONAL rendering change only):
    python tools/make_render_goldens.py
"""

import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

GOLDEN_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                      "tests", "golden")


def make_sphere(radius=0.5, center=(0.0, 0.0, 0.0), n_lat=24, n_lon=32):
    """UV-sphere mesh (verts (V,3) f32, faces (F,3) i32), outward winding."""
    cs = np.asarray(center, np.float32)
    lats = np.linspace(0.0, np.pi, n_lat + 1)
    lons = np.linspace(0.0, 2 * np.pi, n_lon, endpoint=False)
    verts = []
    for th in lats:
        for ph in lons:
            verts.append([np.sin(th) * np.cos(ph),
                          np.sin(th) * np.sin(ph),
                          np.cos(th)])
    verts = np.asarray(verts, np.float32) * radius + cs
    faces = []
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, d])
            faces.append([a, d, c])
    return verts, np.asarray(faces, np.int32)


def checker_bg(h=128, w=128, tile=16):
    """Deterministic non-black background so alpha compositing is pinned."""
    yy, xx = np.mgrid[0:h, 0:w]
    checker = ((yy // tile + xx // tile) % 2).astype(np.uint8)
    img = np.stack([60 + 80 * checker, 70 + 60 * checker,
                    90 + 40 * checker], axis=-1)
    return img.astype(np.uint8)


ROT90_Y = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], np.float32)


def scenes():
    """name -> (verts, faces, cam, background, color, alpha)."""
    s_verts, s_faces = make_sphere()
    # two overlapping spheres at different depths: pins the z-buffer
    v2a, f2a = make_sphere(0.45, center=(-0.25, 0.0, 0.4))
    v2b, f2b = make_sphere(0.45, center=(0.25, 0.15, -0.4))
    occl_v = np.concatenate([v2a, v2b])
    occl_f = np.concatenate([f2a, f2b + len(v2a)]).astype(np.int32)

    cam = np.array([1.2, 1.2, 0.05, -0.05], np.float32)
    black = np.zeros((128, 128, 3), np.uint8)
    return {
        # --render_plain configuration: black canvas, full opacity
        "sphere_plain": (s_verts, s_faces, cam, black, (1.0, 1.0, 0.9), 1.0),
        # demo overlay: alpha compositing over a non-trivial background
        "sphere_overlay": (s_verts, s_faces, cam, checker_bg(),
                           (1.0, 1.0, 0.9), 0.9),
        # demo --sideview: same mesh through the 90-degree y-rotation
        "sphere_sideview": (s_verts @ ROT90_Y.T, s_faces, cam, black,
                            (0.9, 0.9, 1.0), 1.0),
        # occlusion: near sphere must cover the far one where they overlap
        "spheres_occlusion": (occl_v, occl_f, cam, black,
                              (1.0, 0.8, 0.7), 1.0),
    }


def render_scene(spec):
    from tepose_tpu.native import render_mesh

    verts, faces, cam, bg, color, alpha = spec
    return render_mesh(verts, faces, cam, bg.copy(), color=color,
                       alpha=alpha)


def main():
    import cv2

    import os

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, spec in scenes().items():
        img = render_scene(spec)
        path = osp.join(GOLDEN_DIR, f"{name}.png")
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

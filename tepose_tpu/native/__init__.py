"""ctypes bindings for the native host kernels, with build-on-demand and
pure-numpy fallbacks.

The shared library is compiled once with g++ into the package directory; if
no compiler is available the numpy fallbacks keep everything functional
(slower rendering, identical results within float tolerance).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "tepose_native.cpp")
_LIB = osp.join(_HERE, "libtepose_native.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    global _build_failed
    if _build_failed:
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             "-o", _LIB, _SRC],
            check=True, capture_output=True)
        return True
    except Exception:
        _build_failed = True
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not osp.isfile(_LIB) or osp.getmtime(_LIB) < osp.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.render_mesh.argtypes = [
        f32p, ctypes.c_int, i32p, ctypes.c_int, f32p, u8p,
        ctypes.c_int, ctypes.c_int, f32p, ctypes.c_float]
    lib.render_mesh.restype = None
    lib.crop_normalize.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, f32p]
    lib.crop_normalize.restype = None
    lib.crop_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, u8p]
    lib.crop_u8.restype = None
    _lib = lib
    return _lib


def have_native() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# numpy fallbacks (reference semantics, slower)
# ---------------------------------------------------------------------------


# Three directional lights + ambient + emissive, mirroring the reference's
# pyrender scene (ref: renderer.py:84-100) — see the comment block above
# render_mesh in tepose_native.cpp for the full mapping rationale.
_LIGHTS = np.array([[0.0, 1.0, 1.0], [0.0, -1.0, 1.0], [1.0, -1.0, 2.0]])
_LIGHTS = _LIGHTS / np.linalg.norm(_LIGHTS, axis=1, keepdims=True)
_LIGHT_INTENSITY = 0.8 / np.pi  # Lambert BRDF
_AMBIENT, _EMISSIVE = 0.3, 0.1


def _shade_from_normals(n):
    """(..., 3) interpolated (unnormalised) normals -> scalar shade."""
    nn = np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12
    d = np.abs((n / nn) @ _LIGHTS.T)  # double-sided
    return np.minimum(
        1.0, _AMBIENT + _EMISSIVE + _LIGHT_INTENSITY * d.sum(-1))


def _render_mesh_numpy(verts, faces, cam, image, color, alpha):
    h, w = image.shape[:2]
    sx, sy, tx, ty = [float(c) for c in cam]
    px = (1.0 + sx * (verts[:, 0] + tx)) * 0.5 * w
    py = (1.0 + sy * (-verts[:, 1] + ty)) * 0.5 * h
    pz = -verts[:, 2]

    zbuf = np.full((h, w), 1e30, np.float32)
    shade = np.full((h, w), -1.0, np.float32)

    # area-weighted vertex normals (smooth shading, matching the C++ path)
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    vn = np.zeros_like(verts, dtype=np.float64)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)

    for f in range(len(faces)):
        a, b, c = faces[f]
        x0, y0, z0 = px[a], py[a], pz[a]
        x1, y1, z1 = px[b], py[b], pz[b]
        x2, y2, z2 = px[c], py[c], pz[c]
        xmin = max(0, int(np.floor(min(x0, x1, x2))))
        xmax = min(w - 1, int(np.ceil(max(x0, x1, x2))))
        ymin = max(0, int(np.floor(min(y0, y1, y2))))
        ymax = min(h - 1, int(np.ceil(max(y0, y1, y2))))
        if xmin > xmax or ymin > ymax:
            continue
        denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
        if abs(denom) < 1e-12:
            continue
        xs, ys = np.meshgrid(np.arange(xmin, xmax + 1),
                             np.arange(ymin, ymax + 1))
        w0 = ((y1 - y2) * (xs - x2) + (x2 - x1) * (ys - y2)) / denom
        w1 = ((y2 - y0) * (xs - x2) + (x0 - x2) * (ys - y2)) / denom
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        z = w0 * z0 + w1 * z1 + w2 * z2
        sub_z = zbuf[ymin:ymax + 1, xmin:xmax + 1]
        closer = inside & (z < sub_z)
        sub_z[closer] = z[closer]
        n_pix = (w0[..., None] * vn[a] + w1[..., None] * vn[b]
                 + w2[..., None] * vn[c])
        shade[ymin:ymax + 1, xmin:xmax + 1][closer] = \
            _shade_from_normals(n_pix[closer])

    mask = shade >= 0
    mesh_rgb = (255.0 * np.asarray(color)[None, :]
                * shade[mask][:, None])
    image[mask] = np.clip(alpha * mesh_rgb + (1 - alpha) * image[mask],
                          0, 255).astype(np.uint8)
    return image


def render_mesh(verts: np.ndarray, faces: np.ndarray, cam: np.ndarray,
                image: np.ndarray, color=(1.0, 1.0, 0.9),
                alpha: float = 0.9) -> np.ndarray:
    """Z-buffered smooth-shaded mesh overlay (in place; returns image).

    Weak-perspective cam (sx, sy, tx, ty) in original-image coords
    (use streaming.demo_utils.convert_crop_cam_to_orig_img). Lighting:
    three directional lights + ambient + emissive matching the reference's
    pyrender scene (ref: renderer.py:84-100), per-pixel interpolated vertex
    normals. Pixel output is pinned by golden-image tests
    (tests/test_render_golden.py).
    """
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    cam = np.ascontiguousarray(cam, np.float32)
    color_a = np.ascontiguousarray(color, np.float32)
    image = np.ascontiguousarray(image, np.uint8)
    lib = get_lib()
    if lib is not None:
        lib.render_mesh(verts, len(verts), faces, len(faces), cam, image,
                        image.shape[0], image.shape[1], color_a, float(alpha))
        return image
    return _render_mesh_numpy(verts, faces, cam, image, color_a, alpha)


def _crop_normalize_numpy(image, bboxes, out_size, scale,
                          normalize=True):
    from tepose_tpu.models.backbone import IMAGENET_MEAN, IMAGENET_STD

    h, w = image.shape[:2]
    n = len(bboxes)
    out = np.zeros((n, 3, out_size, out_size), np.float32)
    for i, (cx, cy, bw, bh) in enumerate(bboxes):
        bw, bh = bw * scale, bh * scale
        step_x, step_y = bw / out_size, bh / out_size
        xs = cx - bw / 2 + (np.arange(out_size) + 0.5) * step_x
        ys = cy - bh / 2 + (np.arange(out_size) + 0.5) * step_y
        gx, gy = np.meshgrid(xs, ys)
        valid = (gx >= 0) & (gx <= w - 1) & (gy >= 0) & (gy <= h - 1)
        gxc = np.clip(gx, 0, w - 1)
        gyc = np.clip(gy, 0, h - 1)
        ix, iy = gxc.astype(int), gyc.astype(int)
        fx, fy = gxc - ix, gyc - iy
        ix1 = np.minimum(ix + 1, w - 1)
        iy1 = np.minimum(iy + 1, h - 1)
        img = image.astype(np.float32)
        for ch in range(3):
            v = ((1 - fy) * ((1 - fx) * img[iy, ix, ch]
                             + fx * img[iy, ix1, ch])
                 + fy * ((1 - fx) * img[iy1, ix, ch]
                         + fx * img[iy1, ix1, ch]))
            v = np.where(valid, v, 0.0)
            if normalize:
                out[i, ch] = (v / 255.0 - IMAGENET_MEAN[ch]) \
                    / IMAGENET_STD[ch]
            else:
                out[i, ch] = v + 0.5  # truncated to uint8 below
    return out if normalize else out.astype(np.uint8)


def crop_normalize(image: np.ndarray, bboxes: np.ndarray,
                   out_size: int = 224, scale: float = 1.2,
                   normalize: bool = True) -> np.ndarray:
    """Batched bilinear bbox crops (N, 3, S, S).

    ref: _img_utils.py get_single_image_crop + transforms; bbox =
    (cx, cy, w, h) scaled by `scale`. With `normalize` the output is
    ImageNet-normalised float32; without, raw uint8 — 4x cheaper to ship to
    the accelerator, which then normalises on-device
    (streaming.engine.StreamingEngine.extract_features).
    """
    image = np.ascontiguousarray(image, np.uint8)
    bboxes = np.ascontiguousarray(bboxes, np.float32).reshape(-1, 4)
    lib = get_lib()
    if lib is not None:
        dtype = np.float32 if normalize else np.uint8
        out = np.empty((len(bboxes), 3, out_size, out_size), dtype)
        fn = lib.crop_normalize if normalize else lib.crop_u8
        fn(image, image.shape[0], image.shape[1], bboxes,
           len(bboxes), out_size, float(scale), out)
        return out
    out = _crop_normalize_numpy(image, bboxes, out_size, scale,
                                normalize=normalize)
    return out

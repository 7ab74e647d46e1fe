"""Native kernel tests: C++ vs numpy fallback parity + sanity."""

import numpy as np
import pytest

from tepose_tpu import native


def test_native_builds():
    assert native.have_native(), "g++ build of tepose_native failed"


def _square_mesh(z=0.0):
    verts = np.array([[-0.5, -0.5, z], [0.5, -0.5, z],
                      [0.5, 0.5, z], [-0.5, 0.5, z]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


def test_render_mesh_covers_expected_region():
    verts, faces = _square_mesh()
    img = np.zeros((100, 100, 3), np.uint8)
    cam = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
    out = native.render_mesh(verts, faces, cam, img.copy(),
                             color=(1, 0, 0), alpha=1.0)
    # square spans [-0.5, 0.5] -> pixels 25..75 in both axes
    assert out[50, 50, 0] > 100      # center covered, red
    assert out[50, 50, 2] == 0
    assert out[10, 10].sum() == 0    # outside untouched
    assert out[50, 80].sum() == 0


def test_render_zbuffer_orders_triangles():
    # near (red) square should occlude far (green) square
    v_near, f = _square_mesh(z=1.0)   # larger z = closer (camera flip)
    v_far, _ = _square_mesh(z=-1.0)
    verts = np.concatenate([v_far, v_near])
    faces = np.concatenate([f, f + 4]).astype(np.int32)
    img = np.zeros((64, 64, 3), np.uint8)
    cam = np.array([1.0, 1.0, 0.0, 0.0], np.float32)

    # give the two squares different colors by rendering separately with
    # z-buffer shared -> instead render combined twice; simpler: far first,
    # then near must overwrite
    out = native.render_mesh(v_far, f, cam, img.copy(), color=(0, 1, 0),
                             alpha=1.0)
    out = native.render_mesh(v_near, f, cam, out, color=(1, 0, 0), alpha=1.0)
    assert out[32, 32, 0] > 100 and out[32, 32, 1] < 100


def test_render_native_matches_numpy():
    rng = np.random.RandomState(0)
    verts = rng.randn(30, 3).astype(np.float32) * 0.3
    faces = rng.randint(0, 30, (40, 3)).astype(np.int32)
    cam = np.array([0.8, 0.8, 0.1, -0.1], np.float32)
    img = rng.randint(0, 255, (80, 80, 3)).astype(np.uint8)

    out_native = native.render_mesh(verts, faces, cam, img.copy())
    out_numpy = native._render_mesh_numpy(verts, faces, cam, img.copy(),
                                          np.array([1.0, 1.0, 0.9]), 0.9)
    # identical coverage decisions, tiny rounding differences tolerated
    diff = np.abs(out_native.astype(int) - out_numpy.astype(int))
    assert (diff > 2).mean() < 0.01


def test_crop_normalize_matches_numpy():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (120, 160, 3)).astype(np.uint8)
    bboxes = np.array([[80.0, 60.0, 60.0, 90.0],
                       [40.0, 40.0, 30.0, 30.0]], np.float32)
    out_native = native.crop_normalize(img, bboxes, out_size=32)
    out_numpy = native._crop_normalize_numpy(img, bboxes, 32, 1.2)
    np.testing.assert_allclose(out_native, out_numpy, atol=1e-4)


def test_crop_normalize_out_of_bounds_zero():
    img = np.full((50, 50, 3), 255, np.uint8)
    bboxes = np.array([[0.0, 0.0, 100.0, 100.0]], np.float32)  # mostly OOB
    out = native.crop_normalize(img, bboxes, out_size=16, scale=1.0)
    # corners outside the image are normalised zeros: (0 - mean)/std
    from tepose_tpu.models.backbone import IMAGENET_MEAN, IMAGENET_STD

    expected = (0.0 - IMAGENET_MEAN[0]) / IMAGENET_STD[0]
    np.testing.assert_allclose(out[0, 0, 0, 0], expected, atol=1e-5)
    assert np.isfinite(out).all()


def test_crop_u8_matches_f32_within_quantization():
    """normalize=False returns raw uint8; renormalising must land within
    half a u8 LSB of the f32 path (the on-device normalisation contract)."""
    rs = np.random.RandomState(3)
    img = (rs.rand(90, 130, 3) * 255).astype(np.uint8)
    bb = np.array([[70.0, 45.0, 40.0, 60.0]], np.float32)

    f32 = native.crop_normalize(img, bb, 48, 1.2)
    u8 = native.crop_normalize(img, bb, 48, 1.2, normalize=False)
    assert u8.dtype == np.uint8

    mean = np.array([0.485, 0.456, 0.406]).reshape(3, 1, 1)
    std = np.array([0.229, 0.224, 0.225]).reshape(3, 1, 1)
    renorm = (u8.astype(np.float32) / 255.0 - mean) / std
    # half an LSB in the worst (smallest-std) channel
    assert np.abs(renorm - f32).max() <= 0.5 / 255.0 / std.min() + 1e-6


def test_crop_u8_numpy_fallback_matches_native():
    if not native.have_native():
        pytest.skip("native lib unavailable")
    rs = np.random.RandomState(4)
    img = (rs.rand(80, 100, 3) * 255).astype(np.uint8)
    bb = np.array([[50.0, 40.0, 30.0, 30.0]], np.float32)
    nat = native.crop_normalize(img, bb, 32, 1.1, normalize=False)
    ref = native._crop_normalize_numpy(img, bb.astype(np.float32), 32, 1.1,
                                normalize=False)
    assert np.abs(nat.astype(int) - ref.astype(int)).max() <= 1

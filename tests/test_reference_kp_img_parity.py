"""Keypoint-registry and image-transform parity against the reference.

The 15-format joint-name registry (_kp_utils.py:46-727) is pure data — a
single typo silently mis-maps a joint through every convert_kps call — so
every list and every (src, dst) conversion is compared against the
reference's own module. The affine crop transform chain
(gen_trans_from_patch_cv -> trans_point2d, _img_utils.py:53-153) is pinned
the same way on random bboxes/rotations.
"""

import numpy as np
import pytest

import reference_shims as shims
from tepose_tpu.data import kp_utils as K

FORMATS = ["mpii3d_test", "mpii3d", "insta", "staf", "spin", "h36m",
           "posetrack", "pennaction", "common", "coco", "mpii", "aich",
           "3dpw", "smplcoco", "smpl"]


@pytest.fixture(scope="module")
def ref_env():
    shims.install_reference()
    yield


def test_joint_name_lists_match_reference(ref_env):
    from lib.data_utils import _kp_utils as ref_kp

    for fmt in FORMATS:
        ref_names = getattr(ref_kp, f"get_{fmt}_joint_names")()
        assert K.joint_names(fmt) == ref_names, fmt


def test_skeleton_tables_match_reference(ref_env):
    """Our name-pair skeleton registry must resolve to the reference's
    hard-coded index tables EXACTLY (same edges, same order, same direction
    — the order drives the alternating bone colours in draw_skeleton)."""
    from lib.data_utils import _kp_utils as ref_kp

    with_tables = ["insta", "staf", "spin", "common", "coco", "mpii",
                   "aich", "3dpw", "smplcoco", "smpl"]
    for fmt in with_tables:
        ref_edges = getattr(ref_kp, f"get_{fmt}_skeleton")()
        np.testing.assert_array_equal(K.skeleton(fmt), ref_edges,
                                      err_msg=fmt)
    # fallback formats resolve to valid in-range common-subset edges
    for fmt in FORMATS:
        edges = K.skeleton(fmt)
        n = len(K.joint_names(fmt))
        assert edges.shape[1] == 2 and len(edges) > 0, fmt
        assert (edges >= 0).all() and (edges < n).all(), fmt


def test_convert_kps_all_pairs_match_reference(ref_env, rng):
    from lib.data_utils import _kp_utils as ref_kp

    for src in FORMATS:
        n_src = len(K.joint_names(src))
        x = rng.randn(3, n_src, 3).astype(np.float32)
        for dst in FORMATS:
            r = ref_kp.convert_kps(x, src, dst)
            o = K.convert_kps(x, src, dst)
            np.testing.assert_allclose(o, r, atol=0,
                                       err_msg=f"{src}->{dst}")
            assert K.perm_idxs(src, dst) == ref_kp.get_perm_idxs(src, dst)


def test_crop_transform_matches_reference(ref_env, rng):
    from lib.data_utils import _img_utils as ref_img

    from tepose_tpu.data.transforms import patch_affine, transform_keypoints

    for _ in range(5):
        cx, cy = rng.rand(2) * 400 + 100
        w, h = rng.rand(2) * 200 + 80
        rot = float(rng.randn() * 20)
        r_t = ref_img.gen_trans_from_patch_cv(cx, cy, w, h, 224, 224,
                                              1.0, rot)
        o_t = patch_affine(cx, cy, w, h, 224, 224, 1.0, rot)
        np.testing.assert_allclose(o_t, np.asarray(r_t), atol=1e-3)

    # transfrom_keypoints: per-frame bbox transform used by every dataset
    kp = (rng.rand(49, 2) * 400).astype(np.float32)
    cx, cy, w, h = 250.0, 260.0, 180.0, 200.0
    r_kp, r_trans = ref_img.transfrom_keypoints(
        kp_2d=kp.copy(), center_x=cx, center_y=cy, width=w, height=h,
        patch_width=224, patch_height=224, do_augment=False)
    bbox = np.array([[cx, cy, w, h]], np.float32).repeat(49, 0)
    o_kp = transform_keypoints(kp.copy()[None], bbox[:1])[0]
    np.testing.assert_allclose(o_kp, r_kp, atol=1e-3)


def test_demo_cam_conversions_match_reference(ref_env, rng):
    """Weak-perspective crop-cam -> original-image cam and crop-coords ->
    original-image coords (ref: demo_utils.py:241-305), used by every
    rendered demo frame and the results pkl."""
    from lib.utils import demo_utils as ref_du

    from tepose_tpu.streaming.demo_utils import (
        convert_crop_cam_to_orig_img, convert_crop_coords_to_orig_img,
        prepare_rendering_results)

    T = 12
    cam = rng.randn(T, 3).astype(np.float32) * 0.2
    cam[:, 0] += 1.0
    bbox = np.stack([rng.rand(T) * 500 + 100, rng.rand(T) * 400 + 100,
                     rng.rand(T) * 150 + 100, rng.rand(T) * 150 + 100],
                    axis=1).astype(np.float32)
    r = ref_du.convert_crop_cam_to_orig_img(cam, bbox, 1280, 720)
    o = convert_crop_cam_to_orig_img(cam, bbox, 1280, 720)
    np.testing.assert_allclose(o, r, atol=1e-4)

    kp = (rng.rand(T, 49, 2) * 224).astype(np.float32)
    r_kp = ref_du.convert_crop_coords_to_orig_img(bbox, kp.copy(), 224)
    o_kp = convert_crop_coords_to_orig_img(bbox, kp.copy(), 224)
    np.testing.assert_allclose(o_kp, r_kp, atol=1e-4)

    # depth-ordered multi-person render prep (ref: demo_utils.py:277-295)
    results = {}
    for pid in (1, 2):
        results[pid] = {
            "verts": rng.randn(T, 8, 3).astype(np.float32),
            "orig_cam": rng.randn(T, 4).astype(np.float32),
            "bboxes": bbox,
            "frame_ids": np.arange(T),
        }
    r_frames = ref_du.prepare_rendering_results(
        {k: {kk: vv for kk, vv in v.items()} for k, v in results.items()}, T)
    o_frames = prepare_rendering_results(results, T)
    assert len(o_frames) == len(r_frames) == T
    for f in range(T):
        assert list(o_frames[f].keys()) == list(r_frames[f].keys()), f
        for pid in o_frames[f]:
            np.testing.assert_allclose(o_frames[f][pid]["verts"],
                                       r_frames[f][pid]["verts"])

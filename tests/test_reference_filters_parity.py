"""Post-processing filter parity against the reference's OWN modules.

Imports `lib.utils.one_euro_filter.OneEuroFilter` (one_euro_filter.py:14)
and `lib.utils.smooth_bbox` (smooth_bbox.py:9-121) from /root/reference and
asserts our `tepose_tpu.ops.filters` reproduces them on shared trajectories
— the 1-euro low-pass recursion (min_cutoff/beta/d_cutoff defaults used by
smooth_pose.py:29-38) and the kp->bbox-param + interpolation + median/
gaussian smoothing chain the demo uses for tracklet bboxes.
"""

import numpy as np
import pytest

import reference_shims as shims
from tepose_tpu.ops import filters as F


@pytest.fixture(scope="module")
def ref_env():
    shims.install_reference()
    yield


def test_one_euro_matches_reference(ref_env, rng):
    from lib.utils.one_euro_filter import OneEuroFilter as RefFilter

    T, D = 60, 72
    t = np.arange(T, dtype=np.float64)
    x = (np.sin(t[:, None] * 0.3) * 0.5
         + rng.randn(T, D) * 0.05).astype(np.float64)

    # the smooth_pose.py:29-38 configuration
    ref = RefFilter(np.zeros(D), x[0], min_cutoff=0.004, beta=0.7)
    ours = F.OneEuroFilter(np.zeros(D), x[0], min_cutoff=0.004, beta=0.7)
    for i in range(1, T):
        r = ref(np.full(D, float(i)), x[i])
        o = ours(np.full(D, float(i)), x[i])
        np.testing.assert_allclose(o, r, atol=1e-10, err_msg=f"t={i}")


def test_kp_to_bbox_and_smoothing_matches_reference(ref_env, rng):
    from lib.utils import smooth_bbox as ref_sb

    T, K = 40, 25
    kps = rng.rand(T, K, 3).astype(np.float32)
    kps[..., :2] = kps[..., :2] * 300 + 100
    kps[..., 2] = rng.rand(T, K)          # confidences
    kps[5, :, 2] = 0.0                    # a fully-invisible frame
    kps[6, :, 2] = 0.0
    kp_list = list(kps)
    # drop a detection entirely -> linear interpolation path (:62-103)
    kp_list[12] = None

    vis = 0.3
    r_params, r_start, r_end = ref_sb.get_all_bbox_params(kp_list, vis)
    o_params, o_start, o_end = F.get_all_bbox_params(kp_list, vis)
    assert (o_start, o_end) == (r_start, r_end)
    np.testing.assert_allclose(o_params, r_params, atol=1e-4)

    r_smooth = ref_sb.smooth_bbox_params(r_params)
    o_smooth = F.smooth_bbox_params(o_params)
    np.testing.assert_allclose(o_smooth, r_smooth, atol=1e-4)

    r_full = ref_sb.get_smooth_bbox_params(kp_list, vis_thresh=vis)
    o_full = F.get_smooth_bbox_params(kp_list, vis_thresh=vis)
    for a, b in zip(o_full, r_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

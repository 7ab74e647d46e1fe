"""Keypoint-format conversion tests."""

import numpy as np

from tepose_tpu.data import kp_utils as K


def test_spin_to_common_is_block25_39(rng):
    """spin joints 25..38 are exactly the 14 common joints in order."""
    x = rng.randn(3, 49, 3).astype(np.float32)
    out = K.convert_kps(x, "spin", "common")
    np.testing.assert_array_equal(out, x[:, 25:39])


def test_spin_to_mpii3d_test_mapping(rng):
    x = rng.randn(2, 49, 3).astype(np.float32)
    out = K.convert_kps(x, "spin", "mpii3d_test")
    assert out.shape == (2, 17, 3)
    spin = K.joint_names("spin")
    # pelvis slot (-3) comes from spin 'hip' (index 39)
    np.testing.assert_array_equal(out[:, -3], x[:, spin.index("hip")])
    np.testing.assert_array_equal(out[:, 0], x[:, spin.index("headtop")])
    # Jaw (H36M) exists in spin but not in mpii3d_test; no crash, and
    # unmatched dst slots would be zero (all match here though)
    assert np.all(out[:, 1] == x[:, spin.index("neck")])


def test_unmatched_dst_joints_zero(rng):
    x = rng.randn(2, 14, 3).astype(np.float32)  # common
    out = K.convert_kps(x, "common", "spin")
    spin = K.joint_names("spin")
    assert np.all(out[:, spin.index("OP Nose")] == 0)
    np.testing.assert_array_equal(out[:, 25:39], x)


def test_2ch_input_padded(rng):
    x = rng.randn(2, 17, 2).astype(np.float32)  # no confidence channel
    out = K.convert_kps(x, "posetrack", "spin")
    assert out.shape == (2, 49, 3)
    assert np.all(out[..., 2] == 0)


def test_perm_idxs():
    idxs = K.perm_idxs("spin", "common")
    assert idxs == list(range(25, 39))

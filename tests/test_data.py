"""Data-pipeline tests: chunking index builders and affine keypoint
transforms (vs a cv2.getAffineTransform oracle built the reference's way)."""

import numpy as np
import pytest

from tepose_tpu.data import chunking as C
from tepose_tpu.data import transforms as T


# ------------------------------------------------------------ transforms


def cv2_oracle_trans(c_x, c_y, src_w, src_h, dst_w, dst_h, scale, rot):
    """3-point-correspondence affine exactly as the reference constructs it."""
    import cv2

    def rot2d(pt, r):
        sn, cs = np.sin(r), np.cos(r)
        return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs],
                        np.float32)

    sw, sh = src_w * scale, src_h * scale
    rr = np.pi * rot / 180
    downdir = rot2d(np.array([0, sh * 0.5], np.float32), rr)
    rightdir = rot2d(np.array([sw * 0.5, 0], np.float32), rr)
    src = np.stack([np.array([c_x, c_y], np.float32),
                    np.array([c_x, c_y], np.float32) + downdir,
                    np.array([c_x, c_y], np.float32) + rightdir])
    dst_c = np.array([dst_w * 0.5, dst_h * 0.5], np.float32)
    dst = np.stack([dst_c, dst_c + [0, dst_h * 0.5], dst_c + [dst_w * 0.5, 0]])
    return cv2.getAffineTransform(src.astype(np.float32),
                                  dst.astype(np.float32))


@pytest.mark.parametrize("rot", [0.0, 15.0, -30.0])
def test_patch_affine_matches_cv2(rng, rot):
    for _ in range(5):
        cx, cy = rng.uniform(50, 400, 2)
        w, h = rng.uniform(40, 300, 2)
        ours = T.patch_affine(cx, cy, w, h, 224, 224, scale=1.2, rot=rot)
        ref = cv2_oracle_trans(cx, cy, w, h, 224, 224, 1.2, rot)
        np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_transform_keypoints_roundtrip(rng):
    bbox = np.array([[100.0, 120.0, 80.0, 160.0]] * 3, np.float32)
    kp = rng.uniform(60, 200, size=(3, 49, 2)).astype(np.float32)
    out = T.transform_keypoints(kp, bbox)
    # the bbox center must land at the patch center
    center = T.transform_keypoints(bbox[:, None, :2].copy(), bbox)
    np.testing.assert_allclose(center[:, 0], [[112, 112]] * 3, atol=1e-3)
    # normalize to [-1,1] and invert
    norm = T.normalize_2d_kp(out)
    back = T.normalize_2d_kp(norm, inv=True)
    np.testing.assert_allclose(back, out, atol=1e-3)


# ------------------------------------------------------------ chunking


def _names(lens):
    out = []
    for i, l in enumerate(lens):
        out += [f"vid{i}"] * l
    return np.asarray(out)


def test_split_into_videos_clamps():
    names = _names([10, 3, 30])
    starts_ends, lens = C.split_into_videos(names, seqlen=6, stride=1,
                                            vidlen=20)
    # vid1 (3 frames < seqlen) dropped; vid2 clamped to 20
    assert starts_ends == [0, 9, 13, 32]
    assert lens == [10, 20]


def test_split_into_videos_val_no_clamp():
    names = _names([10, 30])
    starts_ends, lens = C.split_into_videos_val(names, seqlen=6, stride=1)
    assert starts_ends == [0, 9, 10, 39]
    assert lens == [10, 30]


def test_split_into_chunks_stride_seqlen():
    names = _names([20])
    chunks = C.split_into_chunks(names, seqlen=5, stride=5)
    assert chunks == [[0, 4], [5, 9], [10, 14], [15, 19]]


def test_split_into_chunks_stride1_padding():
    names = _names([10])
    seqlen = 4
    chunks = C.split_into_chunks(names, seqlen=seqlen, stride=1,
                                 is_train=False)
    # base windows: 7; plus seqlen//2 = 2 left dummies and
    # int(seqlen/2+0.5)-1 = 1 right dummy -> 10 == one per frame
    assert len(chunks) == 10
    assert chunks[0] == [0, 0]
    assert chunks[1] == [1, 1]
    assert chunks[2] == [0, 3]
    assert chunks[-1][0] == chunks[-1][1]  # right dummy


def test_combine_into_chunks_packing():
    # clips of 8,8,8 with seqlen 6: each consumes 3 slots; budget for
    # vidlen=12 is 12-6+2=8 slots -> first two clips fit (6<8), third flushes
    names = _names([8, 8, 8])
    items = C.combine_into_chunks(names, seqlen=6, vidlen=12)
    assert items[0] == [[0, 7], [8, 15]]
    assert items[1] == [[16, 23]]


def test_combine_into_chunks_drops_short_clips():
    """Clips shorter than seqlen have <= 0 timeline slots; packing one would
    move the channel offset backward and overwrite the previous clip."""
    names = _names([8, 3, 1, 8])  # the 3- and 1-frame clips must vanish
    items = C.combine_into_chunks(names, seqlen=6, vidlen=12)
    flat = [c for item in items for c in item]
    assert [8, 11] not in flat and [11, 11] not in flat
    assert flat == [[0, 7], [12, 19]]


def test_pack_clip_channels_layout():
    layout, switch_id, total = C.pack_clip_channels([8, 8], seqlen=6,
                                                    vidlen=12)
    assert layout == [(0, 0), (1, 3)]
    assert total == 11
    # first seqlen-1 frames: channel 0 active (init), switch at slot 5..7
    assert switch_id[0, 0] == 1
    assert switch_id[0, 7] == 1  # frames 5..7 belong to clip 0's tail
    # clip 1 occupies timeline 3..10; from 3+5=8 onward channel 1 is active
    assert switch_id[1, 8] == 1 and switch_id[0, 8] == 0
    assert switch_id[1, 10] == 1

"""Offline DB builders over synthetic raw datasets (amass / posetrack /
h36m), exercising the full read_data -> DB contract."""

import json
import os
import os.path as osp
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tools", "preprocess"))


def test_amass_builder(tmp_path, rng):
    import amass as amass_builder

    root = tmp_path / "amass"
    for subj in ("s1", "s2"):
        d = root / "CMU" / subj
        d.mkdir(parents=True)
        np.savez(d / "walk.npz",
                 poses=rng.randn(80, 156).astype(np.float64),
                 betas=rng.randn(16).astype(np.float64))
        np.savez(d / "short.npz",  # < 60 frames -> dropped
                 poses=rng.randn(20, 156).astype(np.float64),
                 betas=rng.randn(16).astype(np.float64))
        np.savez(d / "shape.npz", betas=rng.randn(16))  # skipped
    db = amass_builder.read_data(str(root), sequences=["CMU"])
    assert db["theta"].shape == (160, 82)
    assert len(np.unique(db["vid_name"])) == 2


def _write_posetrack(tmp_path, rng, n_frames=12):
    ann_dir = tmp_path / "posetrack" / "posetrack_data" / "annotations" / \
        "train"
    ann_dir.mkdir(parents=True)
    img_dir = tmp_path / "posetrack" / "images"
    img_dir.mkdir(parents=True)
    import cv2

    kp_names = ["nose", "head_bottom", "head_top", "left_ear", "right_ear",
                "left_shoulder", "right_shoulder", "left_elbow",
                "right_elbow", "left_wrist", "right_wrist", "left_hip",
                "right_hip", "left_knee", "right_knee", "left_ankle",
                "right_ankle"]
    images, annotations = [], []
    for t in range(n_frames):
        fname = f"images/f{t:04d}.jpg"
        cv2.imwrite(str(tmp_path / "posetrack" / fname),
                    rng.randint(0, 255, (120, 160, 3)).astype(np.uint8))
        images.append({"id": t, "frame_id": t, "file_name": fname,
                       "is_labeled": True, "nframes": n_frames})
        kps = np.zeros((17, 3), np.float32)
        kps[:, 0] = 60 + rng.randn(17) * 10
        kps[:, 1] = 60 + rng.randn(17) * 20
        kps[:, 2] = 1
        annotations.append({
            "track_id": 0, "image_id": t,
            "keypoints": kps.ravel().tolist(),
            "bbox": [30.0, 20.0, 60.0, 80.0]})
    ann = {"images": images, "annotations": annotations,
           "categories": [{"keypoints": kp_names}]}
    with open(ann_dir / "seq0.json", "w") as f:
        json.dump(ann, f)
    return str(tmp_path / "posetrack")


def test_posetrack_builder(tmp_path, rng):
    import posetrack as pt_builder

    from tepose_tpu.models.backbone import resnet50_init

    root = _write_posetrack(tmp_path, rng)
    db = pt_builder.read_data(root, "train",
                              backbone=resnet50_init(jax.random.PRNGKey(0)))
    n = len(db["vid_name"])
    assert n == 12
    assert db["joints2D"].shape == (n, 49, 3)  # converted to spin
    assert db["features"].shape == (n, 2048)
    assert np.isfinite(db["features"]).all()


def test_h36m_builder(tmp_path, rng):
    import h36m as h36m_builder

    import cv2

    from tepose_tpu.models.backbone import resnet50_init

    root = tmp_path / "h36m"
    (root / "annotations").mkdir(parents=True)
    seq = root / "images" / "s_01_act_02_subact_01_ca_01"
    seq.mkdir(parents=True)
    n = 10
    for i in range(n):
        cv2.imwrite(str(seq / f"img_{i:06d}.jpg"),
                    rng.randint(0, 255, (100, 120, 3)).astype(np.uint8))
    cameras = {"1": {"R": np.eye(3).tolist(), "t": [0, 0, 4000],
                     "f": [1000, 1000], "c": [60, 50]}}
    joints = {"2": {"1": {str(i): (rng.randn(17, 3) * 200).tolist()
                          for i in range(n)}}}
    with open(root / "annotations" / "Human36M_subject1_camera.json",
              "w") as f:
        json.dump(cameras, f)
    with open(root / "annotations" / "Human36M_subject1_joint_3d.json",
              "w") as f:
        json.dump(joints, f)

    db = h36m_builder.read_data(str(root), "train", "tight",
                                backbone=resnet50_init(jax.random.PRNGKey(1)))
    m = len(db["vid_name"])
    assert m > 0
    assert db["joints3D"].shape == (m, 49, 3)
    assert db["joints2D"].shape == (m, 49, 3)
    # root-centred: spin joint 39 ('hip') is zero
    np.testing.assert_allclose(db["joints3D"][:, 39], 0.0, atol=1e-5)
    assert db["features"].shape == (m, 2048)


def test_insta_sequence_example_pure_python_parser(rng):
    """The TF-free SequenceExample decoder must match tensorflow's parser on
    a real serialized record (and the insta builder's _parse_example must
    produce identical frames/keypoints through both paths)."""
    tf = pytest.importorskip("tensorflow")
    import insta as insta_builder

    T, K = 5, 25
    frames = [bytes(rng.randint(0, 255, 200).astype(np.uint8))
              for _ in range(T)]
    xys = rng.randn(T, 2, K).astype(np.float32)
    vis = (rng.rand(T, K) > 0.3).astype(np.int64)

    def feat_bytes(b):
        return tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[b]))

    def feat_floats(a):
        return tf.train.Feature(
            float_list=tf.train.FloatList(value=a.reshape(-1).tolist()))

    def feat_ints(a):
        return tf.train.Feature(
            int64_list=tf.train.Int64List(value=a.reshape(-1).tolist()))

    ex = tf.train.SequenceExample(
        context=tf.train.Features(
            feature={"meta/N": feat_ints(np.array([T]))}),
        feature_lists=tf.train.FeatureLists(feature_list={
            "image/encoded": tf.train.FeatureList(
                feature=[feat_bytes(f) for f in frames]),
            "image/xys": tf.train.FeatureList(
                feature=[feat_floats(xys[t]) for t in range(T)]),
            "image/vis": tf.train.FeatureList(
                feature=[feat_ints(vis[t]) for t in range(T)]),
        }))
    raw = ex.SerializeToString()

    # low-level decoder
    fl = insta_builder.parse_sequence_example_py(raw)
    assert [v[0] for v in fl["image/encoded"]] == frames
    np.testing.assert_allclose(
        np.stack([np.asarray(v) for v in fl["image/xys"]]),
        xys.reshape(T, -1))
    np.testing.assert_array_equal(
        np.stack([np.asarray(v) for v in fl["image/vis"]]),
        vis)

    # builder-level: TF path vs pure-python path agree exactly
    f_tf, k_tf = insta_builder._parse_example(raw, have_tf=True)
    f_py, k_py = insta_builder._parse_example(raw, have_tf=False)
    assert f_tf == f_py
    np.testing.assert_allclose(k_py, k_tf)

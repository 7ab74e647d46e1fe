"""Tests for the parity-filler components: attention, HMR/VIBE_Demo paths,
trackers, estimate_translation."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from tepose_tpu.models.backbone import hmr_forward, resnet50_init
from tepose_tpu.models.regressor import regressor_init
from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.temporal import (
    temporal_attention_apply, temporal_attention_init)
from tepose_tpu.models.tepose import VibeConfig, vibe_demo_apply, vibe_init


def test_temporal_attention(rng):
    p = temporal_attention_init(jax.random.PRNGKey(0), 128, 6)
    x = jnp.asarray(rng.randn(3, 6, 128).astype(np.float32))
    scores = temporal_attention_apply(p, x)
    assert scores.shape == (3, 6)
    np.testing.assert_allclose(np.asarray(scores).sum(1), 1.0, atol=1e-5)


def test_hmr_forward(rng):
    smpl = synthetic_smpl_model(seed=0, num_verts=64)
    bb = resnet50_init(jax.random.PRNGKey(0))
    reg = regressor_init(jax.random.PRNGKey(1))
    imgs = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    xf, out = hmr_forward(bb, reg, smpl, imgs, return_features=True)
    assert xf.shape == (2, 2048)
    assert out["theta"].shape == (2, 85)


def test_vibe_demo_apply(rng):
    smpl = synthetic_smpl_model(seed=1, num_verts=64)
    bb = resnet50_init(jax.random.PRNGKey(2))
    vcfg = VibeConfig(seqlen=4, n_layers=1, hidden_size=16, add_linear=True)
    vp = vibe_init(jax.random.PRNGKey(3), vcfg)
    imgs = jnp.asarray(rng.randn(1, 4, 3, 64, 64).astype(np.float32))
    out = vibe_demo_apply(vp, bb, smpl, imgs, vcfg)
    assert out["theta"].shape == (1, 4, 85)


def test_iou_tracker(rng):
    from tepose_tpu.streaming.tracker import IoUTracker

    tracker = IoUTracker(iou_thresh=0.3, max_missed=2)
    # two people moving slowly; person B disappears after frame 10
    for t in range(20):
        dets = [[50 + t, 50, 40, 80]]
        if t < 10:
            dets.append([200, 100 + t, 40, 80])
        tracker.update(t, np.asarray(dets, np.float32))
    tracks = tracker.tracklets(min_length=6)
    assert len(tracks) == 2
    lengths = sorted(len(v["frames"]) for v in tracks.values())
    assert lengths == [10, 20]


def test_load_pose_tracklets(tmp_path, rng):
    from tepose_tpu.streaming.tracker import load_pose_tracklets

    for t in range(8):
        kp = np.zeros((21, 3), np.float32)
        kp[:, 0] = 100 + rs_col(rng, 21) * 10 + t
        kp[:, 1] = 100 + rs_col(rng, 21) * 30
        kp[:, 2] = 1.0
        with open(tmp_path / f"f_{t:06d}_keypoints.json", "w") as f:
            json.dump({"people": [
                {"person_id": [3], "pose_keypoints_2d": kp.ravel().tolist()}
            ]}, f)
    tracks = load_pose_tracklets(str(tmp_path))
    assert 3 in tracks
    assert tracks[3]["bbox"].shape == (8, 4)
    assert tracks[3]["joints2d"].shape == (8, 21, 3)


def rs_col(rng, n):
    return rng.randn(n)


def test_estimate_translation_recovers(rng):
    """Projecting with a known translation and solving must recover it."""
    from tepose_tpu.ops.geometry import estimate_translation_np

    S = rng.randn(24, 3).astype(np.float64)
    t_true = np.array([0.3, -0.2, 8.0])
    f, c = 5000.0, 112.0
    P = S + t_true
    j2d = np.stack([P[:, 0] / P[:, 2] * f + c,
                    P[:, 1] / P[:, 2] * f + c], axis=1)
    conf = np.ones(24)
    t_est = estimate_translation_np(S, j2d, conf)
    np.testing.assert_allclose(t_est, t_true, atol=1e-3)

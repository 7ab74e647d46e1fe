"""StreamingEngine: multi-tracklet batching consistency."""

import numpy as np
import jax

from tepose_tpu.models.backbone import resnet50_init
from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import TePoseConfig, VibeConfig, \
    tepose_init, vibe_init
from tepose_tpu.streaming.engine import StreamingEngine


def _engine():
    smpl = synthetic_smpl_model(seed=0, num_verts=64)
    mcfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=16)
    vcfg = VibeConfig(seqlen=6, n_layers=1, hidden_size=16, add_linear=True)
    return StreamingEngine(
        smpl, tepose_init(jax.random.PRNGKey(0), mcfg),
        vibe_init(jax.random.PRNGKey(1), vcfg),
        resnet50_init(jax.random.PRNGKey(2)), mcfg, vcfg,
        window_bucket=16)


def test_run_tracklets_matches_single(rng):
    eng = _engine()
    f1 = rng.randn(14, 2048).astype(np.float32) * 0.1
    f2 = rng.randn(14, 2048).astype(np.float32) * 0.1
    f3 = rng.randn(30, 2048).astype(np.float32) * 0.1  # different bucket

    batched = eng.run_tracklets([f1, f2, f3])
    single = eng.run_tracklet(f1)

    assert batched[0]["theta"].shape == (14, 85)
    assert batched[2]["theta"].shape == (30, 85)
    np.testing.assert_allclose(batched[0]["theta"], single["theta"],
                               atol=1e-3)
    # tracklets don't couple: f1 result independent of f2 presence
    alone = eng.run_tracklets([f1])[0]
    np.testing.assert_allclose(batched[0]["kp_3d"], alone["kp_3d"],
                               atol=1e-3)


def test_extract_features_shapes(rng):
    eng = _engine()
    crops = rng.randn(5, 3, 224, 224).astype(np.float32)
    feats = eng.extract_features(crops)
    assert feats.shape == (5, 2048)
    assert np.isfinite(feats).all()


def test_extract_features_uint8_matches_float32(rng):
    """uint8 crops (on-device normalisation) must reproduce the f32 path
    within u8 quantization error propagated through the backbone."""
    eng = _engine()
    u8 = (rng.rand(3, 3, 224, 224) * 255).astype(np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 3, 1, 1)
    std = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 3, 1, 1)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std

    feats_u8 = eng.extract_features(u8)
    feats_f32 = eng.extract_features(f32)
    np.testing.assert_allclose(feats_u8, feats_f32, atol=1e-4, rtol=1e-4)

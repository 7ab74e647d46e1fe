"""StreamingEngine: multi-tracklet batching consistency."""

import numpy as np
import jax

from tepose_tpu.models.backbone import resnet50_init
from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import TePoseConfig, VibeConfig, \
    tepose_init, vibe_init
from tepose_tpu.streaming.engine import StreamingEngine


def _engine(**kw):
    smpl = synthetic_smpl_model(seed=0, num_verts=64)
    mcfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=16)
    vcfg = VibeConfig(seqlen=6, n_layers=1, hidden_size=16, add_linear=True)
    return StreamingEngine(
        smpl, tepose_init(jax.random.PRNGKey(0), mcfg),
        vibe_init(jax.random.PRNGKey(1), vcfg),
        resnet50_init(jax.random.PRNGKey(2)), mcfg, vcfg,
        window_bucket=16, **kw)


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
    crops = rng.randn(5, 3, 64, 64).astype(np.float32)
    feats = eng.extract_features(crops)
    assert feats.shape == (5, 2048)
    assert np.isfinite(feats).all()


def test_extract_features_multi_matches_loop(rng):
    """One-call multi-tracklet extraction == per-tracklet extraction, across
    chunk boundaries (crop_batch=2 forces several lax.map chunks) and the
    max_frames_per_call super-chunk split."""
    eng = _engine()
    eng.crop_batch = 2
    eng.max_frames_per_call = 6  # force two one-call super-chunks
    c1 = rng.randn(3, 3, 64, 64).astype(np.float32)
    c2 = rng.randn(5, 3, 64, 64).astype(np.float32)

    multi = eng.extract_features_multi([c1, c2])
    assert [f.shape for f in multi] == [(3, 2048), (5, 2048)]
    lone1 = eng.extract_features(c1)
    lone2 = eng.extract_features(c2)
    np.testing.assert_allclose(multi[0], lone1, atol=1e-5)
    np.testing.assert_allclose(multi[1], lone2, atol=1e-5)
    assert eng.extract_features_multi([]) == []


def test_run_tracklets_from_crops_matches_two_stage(rng):
    """The fused crops->features->scan program must equal the two-stage
    path (extract_features_multi + run_tracklets) bit-for-bit semantics."""
    eng = _engine()
    eng.crop_batch = 4  # force several lax.map chunks inside the fusion
    c1 = (rng.rand(8, 3, 64, 64) * 255).astype(np.uint8)
    c2 = (rng.rand(10, 3, 64, 64) * 255).astype(np.uint8)

    fused = eng.run_tracklets_from_crops([c1, c2])
    feats = eng.extract_features_multi([c1, c2])
    staged = eng.run_tracklets(feats)

    assert fused[0]["theta"].shape == (8, 85)
    assert fused[1]["verts"].shape == (10, 64, 3)
    for i in range(2):
        for k in ("theta", "verts", "kp_3d", "kp_2d"):
            np.testing.assert_allclose(fused[i][k], staged[i][k],
                                       atol=1e-4, err_msg=f"{i}/{k}")


def test_bucket_pipeline_multi_bucket_with_fallback(rng):
    """The depth-2 bucket pipeline (dispatch N+1 before draining N) must
    keep results aligned across several length buckets, including a bucket
    that takes the long-video two-stage fallback mid-stream."""
    eng = _engine()
    eng.max_frames_per_call = 40  # 48-padded bucket falls back to two-stage
    c_short1 = (rng.rand(8, 3, 64, 64) * 255).astype(np.uint8)    # bucket 16
    c_long = (rng.rand(44, 3, 64, 64) * 255).astype(np.uint8)     # fallback
    c_mid = (rng.rand(20, 3, 64, 64) * 255).astype(np.uint8)      # bucket 32
    c_short2 = (rng.rand(12, 3, 64, 64) * 255).astype(np.uint8)   # bucket 16

    outs = eng.run_tracklets_from_crops([c_short1, c_long, c_mid, c_short2])
    assert [o["theta"].shape[0] for o in outs] == [8, 44, 20, 12]

    for i, c in enumerate([c_short1, c_long, c_mid, c_short2]):
        lone = eng.run_tracklets_from_crops([c])[0]
        for k in ("theta", "verts"):
            np.testing.assert_allclose(outs[i][k], lone[k], atol=1e-4,
                                       err_msg=f"tracklet {i}/{k}")


def test_mesh_sharded_streaming_matches_single(rng):
    """Multi-chip serving: an engine built over the 8-device CPU mesh must
    reproduce the single-device outputs exactly (streams are independent —
    batch-axis sharding inserts zero collectives)."""
    from tepose_tpu.parallel.mesh import make_mesh

    smpl = synthetic_smpl_model(seed=0, num_verts=64)
    mcfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=16)
    vcfg = VibeConfig(seqlen=6, n_layers=1, hidden_size=16, add_linear=True)
    args = (smpl, tepose_init(jax.random.PRNGKey(0), mcfg),
            vibe_init(jax.random.PRNGKey(1), vcfg),
            resnet50_init(jax.random.PRNGKey(2)), mcfg, vcfg)
    single = StreamingEngine(*args, window_bucket=16)
    sharded = StreamingEngine(*args, window_bucket=16, mesh=make_mesh(8))

    feats = [rng.randn(n, 2048).astype(np.float32) * 0.1
             for n in (14, 14, 30)]
    a = single.run_tracklets(feats)
    b = sharded.run_tracklets(feats)
    for i in range(len(feats)):
        for k in a[i]:
            np.testing.assert_allclose(b[i][k], a[i][k], atol=1e-5,
                                       err_msg=f"{i}/{k}")

    crops = [(rng.rand(8, 3, 64, 64) * 255).astype(np.uint8)]
    fa = single.run_tracklets_from_crops(crops)
    fb = sharded.run_tracklets_from_crops(crops)
    for k in fa[0]:
        # rtol: the mesh path runs the backbone unchunked (no lax.map), so
        # conv reduction order differs at the last-ulp level; synthetic
        # projections amplify feature bits into O(1e3) kp_2d values
        np.testing.assert_allclose(fb[0][k], fa[0][k], rtol=1e-4, atol=1e-4,
                                   err_msg=k)

    # long-video two-stage fallback on the mesh engine: the chunked
    # backbone's per-chunk batch axis shards over the devices (a plain
    # unsharded upload would run it replicated on every chip)
    single.max_frames_per_call = sharded.max_frames_per_call = 16
    c_long = [(rng.rand(20, 3, 64, 64) * 255).astype(np.uint8)]
    ga = single.run_tracklets_from_crops(c_long)
    gb = sharded.run_tracklets_from_crops(c_long)
    for k in ga[0]:
        np.testing.assert_allclose(gb[0][k], ga[0][k], rtol=1e-4, atol=1e-4,
                                   err_msg=f"fallback/{k}")
    assert "stream" in sharded.timings  # fallback scan is stage-attributed


def test_backbone_bf16_close_to_f32(rng):
    """bf16 backbone mode (the demo --precision bf16 knob) stays within
    bf16 rounding of the f32 features, relative to the feature scale."""
    import jax.numpy as jnp

    eng32 = _engine()
    eng16 = _engine()
    eng16.backbone_dtype = jnp.bfloat16
    crops = (rng.rand(3, 3, 64, 64) * 255).astype(np.uint8)
    f32 = eng32.extract_features(crops)
    f16 = eng16.extract_features(crops)
    scale = np.abs(f32).mean()
    assert np.abs(f32 - f16).mean() / scale < 0.01


def test_extract_features_uint8_matches_float32(rng):
    """uint8 crops (on-device normalisation) must reproduce the f32 path
    within u8 quantization error propagated through the backbone."""
    eng = _engine()
    u8 = (rng.rand(3, 3, 64, 64) * 255).astype(np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 3, 1, 1)
    std = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 3, 1, 1)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std

    feats_u8 = eng.extract_features(u8)
    feats_f32 = eng.extract_features(f32)
    # host-f32 vs on-device normalisation differ only in fp op order, but
    # 50 random-weight conv layers amplify that to ~1e-3 relative (the
    # 64x64 final pool averages 4 positions, not 224's 49)
    np.testing.assert_allclose(feats_u8, feats_f32, atol=2e-3, rtol=2e-3)


def test_f16_outputs_within_1mm(rng):
    """VERDICT r2 #2: output_dtype=float16 halves readback bytes; verts must
    stay within 1 mm of the f32 path (theta ships f32 regardless)."""
    import jax.numpy as jnp

    f32 = _engine()
    f16 = _engine(output_dtype=jnp.float16)
    feats = rng.randn(20, 2048).astype(np.float32) * 0.1

    a = f32.run_tracklet(feats)
    b = f16.run_tracklet(feats)
    assert b["verts"].dtype == np.float16
    assert b["kp_3d"].dtype == np.float16
    assert b["theta"].dtype == np.float32  # feedback/pose params stay f32
    np.testing.assert_allclose(a["theta"], b["theta"], atol=1e-5)
    # verts are in meters: 1e-3 = 1 mm
    err = np.abs(a["verts"] - b["verts"].astype(np.float32)).max()
    assert err < 1e-3, f"f16 vertex error {err * 1000:.3f} mm"


def test_joints_only_outputs(rng):
    """outputs=(theta, kp_3d) serves without meshes: result dicts carry only
    the requested keys and match the full engine on those keys."""
    full = _engine()
    slim = _engine(outputs=("theta", "kp_3d"))
    c1 = (rng.rand(8, 3, 64, 64) * 255).astype(np.uint8)

    a = full.run_tracklets_from_crops([c1])[0]
    b = slim.run_tracklets_from_crops([c1])[0]
    assert set(b) == {"theta", "kp_3d"}
    np.testing.assert_allclose(a["theta"], b["theta"], atol=1e-5)
    np.testing.assert_allclose(a["kp_3d"], b["kp_3d"], atol=1e-5)

    # feature-level path honors the selection too
    feats = rng.randn(14, 2048).astype(np.float32) * 0.1
    assert set(slim.run_tracklet(feats)) == {"theta", "kp_3d"}

    import pytest

    with pytest.raises(ValueError):
        _engine(outputs=("theta", "bogus"))


def test_serving_preset_composition(rng):
    """The composed serving presets (VERDICT r4 #4; demo.py --serving):
    preset='serving' must BE the explicit bf16-backbone + f16-outputs
    composition (same compiled program, bitwise-equal outputs), stay within
    1 mm of the bf16-backbone/f32-output engine (the output knob adds only
    f16 rounding on top of the measured backbone tier), and
    'serving-joints' must additionally select the joints-only output set.
    """
    import jax.numpy as jnp
    import pytest

    from tepose_tpu.streaming.engine import apply_engine_preset

    serving = _engine(preset="serving")
    explicit = _engine(backbone_dtype=jnp.bfloat16,
                       output_dtype=jnp.float16)
    bf16_f32out = _engine(backbone_dtype=jnp.bfloat16)
    crops = (rng.rand(10, 3, 64, 64) * 255).astype(np.uint8)

    a = serving.run_tracklets_from_crops([crops])[0]
    b = explicit.run_tracklets_from_crops([crops])[0]
    c = bf16_f32out.run_tracklets_from_crops([crops])[0]

    assert a["verts"].dtype == np.float16
    assert a["theta"].dtype == np.float32  # feedback stays f32 (engine doc)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # composition vs the bf16 tier alone: only f16 output rounding (verts
    # are meters; 1e-3 = 1 mm, same bar as test_f16_outputs_within_1mm)
    assert np.abs(c["verts"] - a["verts"].astype(np.float32)).max() < 1e-3
    np.testing.assert_allclose(c["theta"], a["theta"], atol=1e-5)

    joints = _engine(preset="serving-joints")
    j = joints.run_tracklets_from_crops([crops])[0]
    assert set(j) == {"theta", "kp_3d"}
    np.testing.assert_allclose(j["theta"], a["theta"], atol=1e-5)

    # explicit knobs win over the preset; unknown names error
    override = _engine(preset="serving", output_dtype=jnp.float32)
    assert override.output_dtype == jnp.float32
    assert override.backbone_dtype == jnp.bfloat16
    with pytest.raises(ValueError, match="preset"):
        _engine(preset="turbo")
    bd, od, outs = apply_engine_preset(None, None, None,
                                       ("theta", "verts"))
    assert (bd, od, outs) == (None, None, ("theta", "verts"))

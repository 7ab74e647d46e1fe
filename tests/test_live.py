"""LiveSession: frame-at-a-time streaming must equal the offline engine.

The live mode's whole contract is exact agreement with the batch path:
frames 0..S-2 are the causal VIBE bootstrap (offline boot frames), frames
t >= S-1 are the theta-feedback window k = t-S+1 (offline scan).
"""

import numpy as np
import jax
import pytest

from tepose_tpu.models.backbone import resnet50_init
from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import TePoseConfig, VibeConfig, \
    tepose_init, vibe_init
from tepose_tpu.streaming.engine import StreamingEngine
from tepose_tpu.streaming.live import LiveSession

pytestmark = pytest.mark.heavy


def _models():
    smpl = synthetic_smpl_model(seed=0, num_verts=64)
    mcfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=16)
    vcfg = VibeConfig(seqlen=6, n_layers=1, hidden_size=16, add_linear=True)
    tp = tepose_init(jax.random.PRNGKey(0), mcfg)
    vp = vibe_init(jax.random.PRNGKey(1), vcfg)
    bb = resnet50_init(jax.random.PRNGKey(2))
    return smpl, mcfg, vcfg, tp, vp, bb


def test_live_session_matches_offline_engine(rng):
    smpl, mcfg, vcfg, tp, vp, bb = _models()
    engine = StreamingEngine(smpl, tp, vp, bb, mcfg, vcfg, window_bucket=16)
    T = 20
    feats = rng.randn(T, 2048).astype(np.float32) * 0.1
    offline = engine.run_tracklet(feats)

    live = LiveSession(smpl, tp, vp, mcfg, vcfg, n_streams=1,
                       outputs=("theta", "verts", "kp_3d"))
    S = mcfg.seqlen
    for t in range(T):
        out = live.push(feats[t:t + 1])
        assert out["valid"] == (t >= S - 1), t
        for k in ("theta", "verts", "kp_3d"):
            np.testing.assert_allclose(
                out[k][0], offline[k][t], rtol=2e-4, atol=2e-5,
                err_msg=f"frame {t} key {k}")


def test_live_session_crops_and_multi_stream(rng):
    smpl, mcfg, vcfg, tp, vp, bb = _models()
    engine = StreamingEngine(smpl, tp, vp, bb, mcfg, vcfg, window_bucket=16,
                             crop_batch=8)
    T, B = 8, 2
    crops = (rng.rand(B, T, 3, 64, 64) * 255).astype(np.uint8)
    offline = engine.run_tracklets_from_crops([crops[0], crops[1]])

    live = LiveSession(smpl, tp, vp, mcfg, vcfg, n_streams=B,
                       backbone_params=bb, outputs=("theta", "kp_3d"))
    for t in range(T):
        out = live.push(crops[:, t])
        for b in range(B):
            np.testing.assert_allclose(
                out["theta"][b], offline[b]["theta"][t], rtol=2e-4,
                atol=2e-5, err_msg=f"frame {t} stream {b}")


def test_live_session_rejects_bad_args():
    smpl, mcfg, vcfg, tp, vp, _ = _models()
    with pytest.raises(ValueError, match="unknown outputs"):
        LiveSession(smpl, tp, vp, mcfg, vcfg, outputs=("bogus",))
    with pytest.raises(ValueError, match="non-empty"):
        LiveSession(smpl, tp, vp, mcfg, vcfg, outputs=())
    with pytest.raises(ValueError, match="causal"):
        LiveSession(smpl, tp, vp, mcfg,
                    VibeConfig(seqlen=6, n_layers=1, hidden_size=16,
                               bidirectional=True))
    live = LiveSession(smpl, tp, vp, mcfg, vcfg, n_streams=2)
    with pytest.raises(ValueError, match="streams"):
        live.push(np.zeros((1, 2048), np.float32))


def test_live_session_survives_interrupted_step(rng):
    """An exception inside the (carry-donating) device step must not brick
    the session: the carry is re-seeded and later pushes keep working."""
    smpl, mcfg, vcfg, tp, vp, _ = _models()
    live = LiveSession(smpl, tp, vp, mcfg, vcfg, n_streams=2)
    x = rng.randn(2, 2048).astype(np.float32) * 0.1
    for _ in range(mcfg.seqlen):
        out = live.push(x)
    assert out["valid"].all()  # streams warmed past the bootstrap

    orig = live._step

    def boom(*a, **k):
        raise KeyboardInterrupt

    live._step = boom
    with pytest.raises(KeyboardInterrupt):
        live.push(x)
    live._step = orig

    out = live.push(x)  # session still usable...
    assert not out["valid"].any()  # ...but streams were re-seeded to fresh
    assert np.isfinite(out["theta"]).all()
    for _ in range(mcfg.seqlen):
        out = live.push(x)
    assert out["valid"].all()


def test_live_per_stream_reset(rng):
    """push(reset=mask) must re-seed exactly the masked slot: from the reset
    frame on, that stream's outputs equal a FRESH session fed only the new
    tracklet, while the untouched stream continues its own rollout."""
    smpl, mcfg, vcfg, tp, vp, _ = _models()
    T = 14
    a = rng.randn(T, 2048).astype(np.float32) * 0.1   # slot 0, uninterrupted
    b1 = rng.randn(6, 2048).astype(np.float32) * 0.1  # slot 1, old person
    b2 = rng.randn(T - 6, 2048).astype(np.float32) * 0.1  # slot 1, new person

    live = LiveSession(smpl, tp, vp, mcfg, vcfg, n_streams=2,
                       outputs=("theta", "kp_3d"))
    got_a, got_b2, valid_b = [], [], []
    for t in range(T):
        xb = b1[t] if t < 6 else b2[t - 6]
        reset = np.array([False, t == 6])
        out = live.push(np.stack([a[t], xb]), reset=reset)
        got_a.append(out["theta"][0])
        valid_b.append(bool(out["valid"][1]))
        if t >= 6:
            got_b2.append(out["theta"][1])

    # slot 1 restarted: validity refilled from the reset point
    S = mcfg.seqlen
    assert valid_b[6:6 + S - 1] == [False] * (S - 1)
    assert all(valid_b[6 + S - 1:])

    # slot 0 unaffected: equals a fresh single-stream rollout of `a`
    solo = LiveSession(smpl, tp, vp, mcfg, vcfg, n_streams=1,
                       outputs=("theta",))
    for t in range(T):
        np.testing.assert_allclose(got_a[t], solo.push(a[t:t + 1])["theta"][0],
                                   rtol=2e-4, atol=2e-5, err_msg=f"t={t}")

    # slot 1 after reset equals a fresh session fed only b2
    fresh = LiveSession(smpl, tp, vp, mcfg, vcfg, n_streams=1,
                        outputs=("theta",))
    for i in range(T - 6):
        np.testing.assert_allclose(
            got_b2[i], fresh.push(b2[i:i + 1])["theta"][0],
            rtol=2e-4, atol=2e-5, err_msg=f"reset frame {i}")


def test_live_session_mesh_matches_single(rng):
    """LiveSession(mesh=8 devices) must reproduce the single-device rollout
    per stream, including a mid-session per-stream reset."""
    from tepose_tpu.parallel.mesh import make_mesh

    smpl, mcfg, vcfg, tp, vp, _ = _models()
    B, T = 8, 12
    feats = rng.randn(T, B, 2048).astype(np.float32) * 0.1

    solo = LiveSession(smpl, tp, vp, mcfg, vcfg, n_streams=B,
                       outputs=("theta", "kp_3d"))
    mesh = make_mesh(8)
    sharded = LiveSession(smpl, tp, vp, mcfg, vcfg, n_streams=B,
                          outputs=("theta", "kp_3d"), mesh=mesh)
    for t in range(T):
        reset = None
        if t == 5:
            reset = np.zeros((B,), bool)
            reset[3] = True  # churn one slot mid-session
        a = solo.push(feats[t], reset=reset)
        b = sharded.push(feats[t], reset=reset)
        np.testing.assert_array_equal(a["valid"], b["valid"], err_msg=f"t={t}")
        for k in ("theta", "kp_3d"):
            np.testing.assert_allclose(a[k], b[k], rtol=2e-4, atol=2e-5,
                                       err_msg=f"t={t} {k}")


def test_live_session_bf16_backbone_close(rng):
    """LiveSession(backbone_dtype=bf16) — demo.py --live --precision bf16 —
    must track the f32 session's outputs closely (same tolerance family as
    the offline engine's bf16 backbone tests)."""
    import jax.numpy as jnp

    smpl, mcfg, vcfg, tp, vp, bb = _models()
    T, B = 8, 2
    crops = (rng.rand(B, T, 3, 64, 64) * 255).astype(np.uint8)
    f32 = LiveSession(smpl, tp, vp, mcfg, vcfg, n_streams=B,
                      backbone_params=bb, outputs=("theta",))
    b16 = LiveSession(smpl, tp, vp, mcfg, vcfg, n_streams=B,
                      backbone_params=bb, outputs=("theta",),
                      backbone_dtype=jnp.bfloat16)
    for t in range(T):
        a = f32.push(crops[:, t])["theta"]
        b = b16.push(crops[:, t])["theta"]
        assert np.isfinite(b).all()
        # random-init weights amplify the bf16 feature error; the bound
        # here is a sanity envelope, the real accuracy claim is the
        # offline engine's bf16-backbone parity test
        np.testing.assert_allclose(a, b, rtol=0.1, atol=0.15,
                                   err_msg=f"frame {t}")

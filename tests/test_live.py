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
    with pytest.raises(ValueError, match="causal"):
        LiveSession(smpl, tp, vp, mcfg,
                    VibeConfig(seqlen=6, n_layers=1, hidden_size=16,
                               bidirectional=True))
    live = LiveSession(smpl, tp, vp, mcfg, vcfg, n_streams=2)
    with pytest.raises(ValueError, match="streams"):
        live.push(np.zeros((1, 2048), np.float32))

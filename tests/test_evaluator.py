"""Evaluator tests: the batched lax.scan theta-feedback evaluation must match
a per-video sequential Python reimplementation (the reference's loop shape,
evaluate.py:247-269), and metric aggregation must follow the conventions."""

import numpy as np
import jax
import jax.numpy as jnp

from tepose_tpu.eval.evaluator import (
    EvalAccumulator, make_eval_scan, spin49_to_eval_format)
from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import (
    TePoseConfig, VibeConfig, tepose_init, tepose_apply, vibe_init,
    vibe_apply)


def test_batched_eval_equals_sequential(rng):
    smpl = synthetic_smpl_model(seed=0, num_verts=64)
    mcfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=32)
    vcfg = VibeConfig(seqlen=6, n_layers=1, hidden_size=32, add_linear=True)
    gen = tepose_init(jax.random.PRNGKey(0), mcfg)
    vibe = vibe_init(jax.random.PRNGKey(1), vcfg)

    B, T, S = 3, 14, 6
    W = T - S + 1
    feats = rng.randn(B, T, 2048).astype(np.float32) * 0.1
    pseu = rng.randn(B, S - 1, 85).astype(np.float32) * 0.1
    theta_gt = rng.randn(B, T, 85).astype(np.float32) * 0.1
    jreg = rng.rand(17, 64).astype(np.float32)

    fn = make_eval_scan(smpl, mcfg, vcfg, W, use_j_regressor=True)
    out = fn(gen, vibe, jnp.asarray(feats), jnp.asarray(pseu),
             jnp.asarray(theta_gt), jnp.asarray(jreg))

    assert out["pred_j3d"].shape == (B, T, 14, 3)
    assert out["pred_theta"].shape == (B, T, 85)
    assert out["mpvpe"].shape == (B, T)

    # sequential single-video reference for video 1
    b = 1
    vo = vibe_apply(vibe, smpl, jnp.asarray(feats[b:b + 1, :S]), vcfg,
                    j_regressor=jnp.asarray(jreg))
    seq_j3d = [np.asarray(vo["kp_3d"][0, :S - 1])]
    buf = pseu[b].copy()
    for k in range(W):
        inp = np.concatenate(
            [feats[b, k:k + S],
             np.concatenate([buf, np.zeros((1, 85), np.float32)], 0)],
            axis=-1)
        o = tepose_apply(gen, smpl, jnp.asarray(inp)[None], mcfg,
                         j_regressor=jnp.asarray(jreg))
        theta = np.asarray(o["theta"][0])
        seq_j3d.append(np.asarray(o["kp_3d"]))
        buf = np.concatenate([buf[1:], theta[None]], axis=0)
    seq_j3d = np.concatenate(seq_j3d, axis=0)

    np.testing.assert_allclose(np.asarray(out["pred_j3d"][b]), seq_j3d,
                               atol=2e-4)


def test_sharded_eval_matches_single_device(rng):
    """DP eval over the 8-device CPU mesh must reproduce the single-device
    batched scan exactly (no cross-sample coupling, zero collectives)."""
    from tepose_tpu.eval.evaluator import make_sharded_eval_scan
    from tepose_tpu.parallel.mesh import make_mesh

    smpl = synthetic_smpl_model(seed=0, num_verts=64)
    mcfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=32)
    vcfg = VibeConfig(seqlen=6, n_layers=1, hidden_size=32, add_linear=True)
    gen = tepose_init(jax.random.PRNGKey(0), mcfg)
    vibe = vibe_init(jax.random.PRNGKey(1), vcfg)

    B, T, S = 8, 14, 6
    W = T - S + 1
    feats = rng.randn(B, T, 2048).astype(np.float32) * 0.1
    pseu = rng.randn(B, S - 1, 85).astype(np.float32) * 0.1
    theta_gt = rng.randn(B, T, 85).astype(np.float32) * 0.1
    jreg = rng.rand(17, 64).astype(np.float32)

    single = make_eval_scan(smpl, mcfg, vcfg, W, use_j_regressor=True)(
        gen, vibe, jnp.asarray(feats), jnp.asarray(pseu),
        jnp.asarray(theta_gt), jnp.asarray(jreg))

    mesh = make_mesh(8)
    fn, place_w, place_d = make_sharded_eval_scan(
        smpl, mcfg, vcfg, W, use_j_regressor=True, mesh=mesh)
    data = place_d({"feats": feats, "theta_pseu": pseu,
                    "theta_gt": theta_gt})
    pj, pt, mp = fn(place_w(gen), place_w(vibe), data["feats"],
                    data["theta_pseu"], data["theta_gt"],
                    place_w(jnp.asarray(jreg)))

    np.testing.assert_allclose(np.asarray(pj),
                               np.asarray(single["pred_j3d"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pt),
                               np.asarray(single["pred_theta"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mp),
                               np.asarray(single["mpvpe"]), atol=1e-5)


def test_eval_accumulator_conventions(rng):
    acc = EvalAccumulator(dataset="3dpw")
    T = 10
    pred = rng.randn(T, 14, 3).astype(np.float32)
    tgt = pred + 0.01  # constant offset vanishes after pelvis alignment

    acc.add_video(pred, tgt, mpvpe=np.full(T, 0.05))
    s = acc.summarize()
    # constant translation is removed by pelvis alignment -> ~0 error
    assert s["mpjpe"] < 1e-3
    assert s["pa_mpjpe"] < 1e-2
    np.testing.assert_allclose(s["mpvpe"], 50.0)  # 0.05 m -> 50 mm
    # accel rows exclude the zero-padded boundary frames
    assert len(acc.accel_err[0]) == T - 2


def test_eval_accumulator_mpii3d_pelvis(rng):
    acc = EvalAccumulator(dataset="mpii3d")
    pred = rng.randn(6, 17, 3).astype(np.float32)
    tgt = pred.copy()
    tgt += rng.randn(1, 1, 3).astype(np.float32)  # rigid offset
    acc.add_video(pred, tgt, valid_map=np.arange(6))
    s = acc.summarize()
    assert s["mpjpe"] < 1e-3  # offset removed via joint -3 alignment


def test_spin49_to_eval_format(rng):
    x = rng.randn(4, 49, 3).astype(np.float32)
    common = spin49_to_eval_format(x, "3dpw")
    np.testing.assert_array_equal(common, x[:, 25:39])
    m17 = spin49_to_eval_format(x, "mpii3d")
    assert m17.shape == (4, 17, 3)

"""fast_stream_scan must reproduce the plain tepose_apply window scan."""

import numpy as np
import jax
import jax.numpy as jnp

from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import TePoseConfig, tepose_init, tepose_apply
from tepose_tpu.streaming.fast_scan import fast_stream_scan


def plain_stream(params, smpl, feats, buf0, cfg, W, jreg=None):
    S = cfg.seqlen

    def step(buf, k):
        win = jax.lax.dynamic_slice_in_dim(feats, k, S, axis=1)
        fb = jnp.concatenate([buf, jnp.zeros_like(buf[:, :1])], axis=1)
        out = tepose_apply(params, smpl, jnp.concatenate([win, fb], -1),
                           cfg, j_regressor=jreg)
        th = out["theta"]
        return (jnp.concatenate([buf[:, 1:], th[:, None]], 1),
                (th, out["kp_3d"]))

    _, (th, j3d) = jax.lax.scan(step, buf0, jnp.arange(W))
    return jnp.swapaxes(th, 0, 1), jnp.swapaxes(j3d, 0, 1)


def test_fast_scan_matches_plain(rng):
    cfg = TePoseConfig(seqlen=6, n_layers=2, hidden_size=32)
    smpl = synthetic_smpl_model(seed=0, num_verts=64)
    params = tepose_init(jax.random.PRNGKey(0), cfg)

    B, T = 2, 16
    W = T - cfg.seqlen + 1
    feats = jnp.asarray(rng.randn(B, T, 2048).astype(np.float32) * 0.1)
    buf0 = jnp.asarray(rng.randn(B, 5, 85).astype(np.float32) * 0.1)

    th_ref, j3d_ref = plain_stream(params, smpl, feats, buf0, cfg, W)
    out = fast_stream_scan(params, smpl, feats, buf0, cfg, W)

    # theta feedback compounds errors through the scan; still tight
    np.testing.assert_allclose(np.asarray(out["theta"]), np.asarray(th_ref),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["kp_3d"]), np.asarray(j3d_ref),
                               atol=5e-4)


def test_fast_scan_with_j_regressor(rng):
    cfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=16)
    smpl = synthetic_smpl_model(seed=1, num_verts=48)
    params = tepose_init(jax.random.PRNGKey(1), cfg)
    jreg = jnp.asarray(rng.rand(17, 48).astype(np.float32))

    B, T = 1, 10
    W = T - cfg.seqlen + 1
    feats = jnp.asarray(rng.randn(B, T, 2048).astype(np.float32) * 0.1)
    buf0 = jnp.zeros((B, 5, 85))

    out = fast_stream_scan(params, smpl, feats, buf0, cfg, W,
                           j_regressor=jreg,
                           outputs=("theta", "kp_3d", "verts"))
    assert out["kp_3d"].shape == (B, W, 14, 3)
    assert out["verts"].shape == (B, W, 48, 3)

    th_ref, j3d_ref = plain_stream(params, smpl, feats, buf0, cfg, W,
                                   jreg=jreg)
    np.testing.assert_allclose(np.asarray(out["kp_3d"]),
                               np.asarray(j3d_ref), atol=5e-4)


def test_precompute_projections_identical(rng):
    """Precomputed frame projections (one big matmul outside the scan) must
    be bit-identical to the per-window recompute path — same matmul, just
    hoisted out of the overlapping windows."""
    cfg = TePoseConfig(seqlen=6, n_layers=2, hidden_size=32)
    smpl = synthetic_smpl_model(seed=0, num_verts=64)
    params = tepose_init(jax.random.PRNGKey(0), cfg)

    B, T = 2, 16
    W = T - cfg.seqlen + 1
    feats = jnp.asarray(rng.randn(B, T, 2048).astype(np.float32) * 0.1)
    buf0 = jnp.asarray(rng.randn(B, 5, 85).astype(np.float32) * 0.1)

    pre = fast_stream_scan(params, smpl, feats, buf0, cfg, W,
                           precompute_projections=True)
    rec = fast_stream_scan(params, smpl, feats, buf0, cfg, W,
                           precompute_projections=False)
    np.testing.assert_array_equal(np.asarray(pre["theta"]),
                                  np.asarray(rec["theta"]))

"""Loss semantics tests: the masked-mean formulation must equal the
reference's dynamic row filtering (computed here with plain numpy)."""

import numpy as np
import jax
import jax.numpy as jnp

from tepose_tpu.models import gcn as G
from tepose_tpu.ops.geometry import batch_rodrigues
from tepose_tpu.train import loss as Lo


def test_masked_row_mean_equals_filtering(rng):
    x = rng.randn(10, 7, 3).astype(np.float32)
    mask = rng.rand(10) > 0.4
    ours = float(Lo._masked_row_mean(jnp.asarray(x), jnp.asarray(mask)))
    ref = x[mask].mean() if mask.any() else 0.0
    np.testing.assert_allclose(ours, ref, atol=1e-6)

    # empty mask -> exactly 0
    zero = float(Lo._masked_row_mean(jnp.asarray(x),
                                     jnp.zeros(10, dtype=bool)))
    assert zero == 0.0


def test_keypoint_2d_loss_matches_filtering(rng):
    pred = rng.randn(8, 49, 2).astype(np.float32)
    gt = rng.randn(8, 49, 3).astype(np.float32)
    gt[..., 2] = rng.rand(8, 49)  # confidences
    mask = rng.rand(8) > 0.3

    ours = float(Lo.keypoint_2d_loss(jnp.asarray(pred), jnp.asarray(gt),
                                     jnp.asarray(mask)))
    conf = gt[mask][..., 2:3]
    ref = (conf * (pred[mask] - gt[mask][..., :2]) ** 2).mean()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_keypoint_3d_loss_matches_filtering(rng):
    pred = rng.randn(8, 49, 3).astype(np.float32)
    gt = rng.randn(8, 49, 3).astype(np.float32)
    mask = rng.rand(8) > 0.3

    ours = float(Lo.keypoint_3d_loss(jnp.asarray(pred), jnp.asarray(gt),
                                     jnp.asarray(mask)))
    p = pred[mask][:, 25:39]
    g = gt[mask][:, 25:39]
    g = g - ((g[:, 2] + g[:, 3]) / 2)[:, None]
    p = p - ((p[:, 2] + p[:, 3]) / 2)[:, None]
    ref = ((p - g) ** 2).mean()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_smpl_losses_match_filtering(rng):
    pose_p = (rng.randn(6, 72) * 0.5).astype(np.float32)
    pose_g = (rng.randn(6, 72) * 0.5).astype(np.float32)
    b_p = rng.randn(6, 10).astype(np.float32)
    b_g = rng.randn(6, 10).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0, 1], dtype=bool)

    lp, ls = Lo.smpl_losses(jnp.asarray(pose_p), jnp.asarray(b_p),
                            jnp.asarray(pose_g), jnp.asarray(b_g),
                            jnp.asarray(mask))
    rm_p = np.asarray(batch_rodrigues(
        jnp.asarray(pose_p[mask].reshape(-1, 3)))).reshape(-1, 24, 3, 3)
    rm_g = np.asarray(batch_rodrigues(
        jnp.asarray(pose_g[mask].reshape(-1, 3)))).reshape(-1, 24, 3, 3)
    np.testing.assert_allclose(float(lp), ((rm_p - rm_g) ** 2).mean(),
                               rtol=1e-5)
    np.testing.assert_allclose(float(ls), ((b_p[mask] - b_g[mask]) ** 2).mean(),
                               rtol=1e-5)


def test_disc_losses(rng):
    d = rng.rand(6).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 0, 1], dtype=bool)
    ours = float(Lo.encoder_disc_l2_loss(jnp.asarray(d), jnp.asarray(mask)))
    ref = ((d[mask] - 1.0) ** 2).sum() / mask.sum()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)

    real = rng.rand(6).astype(np.float32)
    fake = rng.rand(6).astype(np.float32)
    la, lb, tot = Lo.adv_disc_l2_loss(jnp.asarray(real), jnp.asarray(fake),
                                      jnp.asarray(mask), jnp.asarray(mask))
    ref_la = ((real[mask] - 1) ** 2).sum() / mask.sum()
    ref_lb = (fake[mask] ** 2).sum() / mask.sum()
    np.testing.assert_allclose(float(la), ref_la, rtol=1e-5)
    np.testing.assert_allclose(float(lb), ref_lb, rtol=1e-5)
    np.testing.assert_allclose(float(tot), ref_la + ref_lb, rtol=1e-5)


def test_wasserstein_disc_losses(rng):
    """ref: loss.py:255-274 — defined-but-unused variants, filtered-row
    semantics checked the same way as the LSGAN terms."""
    d = rng.rand(6).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0, 1], dtype=bool)
    ours = float(Lo.encoder_disc_wasserstein_loss(jnp.asarray(d),
                                                  jnp.asarray(mask)))
    ref = -d[mask].sum() / mask.sum()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)

    real = rng.rand(6).astype(np.float32)
    fake = rng.rand(6).astype(np.float32)
    la, lb, tot = Lo.adv_disc_wasserstein_loss(
        jnp.asarray(real), jnp.asarray(fake),
        jnp.asarray(mask), jnp.asarray(mask))
    ref_la = -real[mask].sum() / mask.sum()
    ref_lb = fake[mask].sum() / mask.sum()
    np.testing.assert_allclose(float(la), ref_la, rtol=1e-5)
    np.testing.assert_allclose(float(lb), ref_lb, rtol=1e-5)
    np.testing.assert_allclose(float(tot), ref_la + ref_lb, rtol=1e-5)

    # empty mask -> exactly 0 (matches the LSGAN terms' guard)
    empty = jnp.zeros(6, dtype=bool)
    assert float(Lo.encoder_disc_wasserstein_loss(jnp.asarray(d),
                                                  empty)) == 0.0


def test_smooth_theta_losses(rng):
    """ref: loss.py:278-287 — |mean(diff)| (abs of the MEAN, a signed-drift
    penalty), both unmasked (reference signature) and row-masked."""
    theta = rng.randn(5, 7, 85).astype(np.float32)

    pose_diff = theta[:, 1:, 3:75] - theta[:, :-1, 3:75]
    shape_diff = theta[:, 1:, 75:] - theta[:, :-1, 75:]
    np.testing.assert_allclose(
        float(Lo.smooth_pose_loss(jnp.asarray(theta))),
        abs(pose_diff.mean()), rtol=1e-5)
    np.testing.assert_allclose(
        float(Lo.smooth_shape_loss(jnp.asarray(theta))),
        abs(shape_diff.mean()), rtol=1e-5)

    mask = np.array([1, 0, 1, 1, 0], dtype=bool)
    np.testing.assert_allclose(
        float(Lo.smooth_pose_loss(jnp.asarray(theta), jnp.asarray(mask))),
        abs(pose_diff[mask].mean()), rtol=1e-5)
    np.testing.assert_allclose(
        float(Lo.smooth_shape_loss(jnp.asarray(theta), jnp.asarray(mask))),
        abs(shape_diff[mask].mean()), rtol=1e-5)


def test_masked_bn_equals_filtered_batch(rng):
    """Row-masked BN stats == running the filtered rows as their own batch.

    This is what makes the discriminator's masked path equivalent to the
    reference's `pred_motion[...mask...]` row filtering (loss.py:133-136)."""
    params, state = G.motion_discriminator_init(jax.random.PRNGKey(0))
    x = rng.randn(8, 6, 72).astype(np.float32) * 0.3
    mask = np.array([1, 0, 1, 1, 0, 1, 1, 0], dtype=bool)

    full, _ = G.motion_discriminator_apply(
        params, state, jnp.asarray(x), train=True,
        row_mask=jnp.asarray(mask))
    filt, _ = G.motion_discriminator_apply(
        params, state, jnp.asarray(x[mask]), train=True)
    np.testing.assert_allclose(np.asarray(full)[mask], np.asarray(filt),
                               atol=1e-5)


def test_tepose_loss_end_to_end(rng):
    """Integration: full loss on fake predictions; finite and well-shaped."""
    B, n_2d, S = 6, 2, 6
    n_3d = B - n_2d
    preds = {
        "theta": jnp.asarray(rng.randn(B, 2, 85).astype(np.float32)),
        "kp_2d": jnp.asarray(rng.randn(B, 2, 49, 2).astype(np.float32)),
        "kp_3d": jnp.asarray(rng.randn(B, 2, 49, 3).astype(np.float32)),
    }
    kp_2d_gt = rng.randn(B, 2, 49, 3).astype(np.float32)
    kp_3d_gt = rng.randn(n_3d, 2, 49, 3).astype(np.float32)
    theta_gt = rng.randn(n_3d, 2, 85).astype(np.float32)
    w_3d = np.array([1, 1, 0, 1], np.float32)
    w_smpl = np.array([1, 0, 0, 1], np.float32)
    valid = np.ones(B, np.float32)
    prev = rng.randn(B, S - 1, 85).astype(np.float32)
    real = rng.randn(B, S, 85).astype(np.float32)

    def fake_disc(x, mask):
        return jnp.tanh(x.mean(axis=(1, 2)))

    gen_loss, dis_loss, ld = Lo.tepose_loss(
        preds, kp_2d_gt=jnp.asarray(kp_2d_gt), kp_3d_gt=jnp.asarray(kp_3d_gt),
        theta_gt=jnp.asarray(theta_gt), w_3d=jnp.asarray(w_3d),
        w_smpl=jnp.asarray(w_smpl), valid=jnp.asarray(valid), n_2d=n_2d,
        prev_thetas=jnp.asarray(prev), real_motion=jnp.asarray(real),
        disc_fn=fake_disc)

    assert np.isfinite(float(gen_loss)) and float(gen_loss) > 0
    assert np.isfinite(float(dis_loss))
    for k, v in ld.items():
        assert np.isfinite(float(v)), k

    # gen_loss = sum of the generator-side terms (ref: loss.py:158)
    expected = sum(float(ld[k]) for k in
                   ["loss_kp_2d", "loss_kp_3d", "loss_shape", "loss_pose",
                    "e_m_disc_loss"])
    np.testing.assert_allclose(float(gen_loss), expected, rtol=1e-5)

    # gradient flows to predictions through the generator loss
    def f(theta):
        g, _, _ = Lo.tepose_loss(
            {**preds, "theta": theta}, kp_2d_gt=jnp.asarray(kp_2d_gt),
            kp_3d_gt=jnp.asarray(kp_3d_gt), theta_gt=jnp.asarray(theta_gt),
            w_3d=jnp.asarray(w_3d), w_smpl=jnp.asarray(w_smpl),
            valid=jnp.asarray(valid), n_2d=n_2d,
            prev_thetas=jnp.asarray(prev), real_motion=jnp.asarray(real),
            disc_fn=fake_disc)
        return g
    g = jax.grad(f)(preds["theta"])
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0

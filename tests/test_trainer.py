"""Integration test: the fully-scanned GAN train segment on tiny shapes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tepose_tpu.models.gcn import motion_discriminator_init
from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import TePoseConfig, tepose_init
from tepose_tpu.train.loss import LossWeights
from tepose_tpu.train.optim import make_optimizer, get_lr, set_lr, \
    ReduceLROnPlateau
from tepose_tpu.train.trainer import TrainHyper, make_train_segment


def _tiny_batches(rng, hp, vidlen=16):
    S = hp.seqlen
    b2, b3 = hp.n_2d, hp.n_3d
    # 2-channel 2D batch with a channel switch halfway
    switch = np.zeros((b2, 2, vidlen), np.float32)
    switch[:, 0, :vidlen // 2] = 1
    switch[:, 1, vidlen // 2:] = 1
    batch_2d = {
        "features": rng.randn(b2, 2, vidlen, 2048).astype(np.float32) * 0.1,
        "theta_pseu": rng.randn(b2, 2, vidlen, 85).astype(np.float32) * 0.1,
        "kp_2d": rng.randn(b2, vidlen, 49, 3).astype(np.float32),
        "switch_id": switch,
        "vidlen_each": np.full((b2,), vidlen, np.float32),
    }
    batch_3d = {
        "features": rng.randn(b3, vidlen, 2048).astype(np.float32) * 0.1,
        "theta_pseu": rng.randn(b3, vidlen, 85).astype(np.float32) * 0.1,
        "kp_2d": rng.randn(b3, vidlen, 49, 3).astype(np.float32),
        "kp_3d": rng.randn(b3, vidlen, 49, 3).astype(np.float32),
        "theta": rng.randn(b3, vidlen, 85).astype(np.float32) * 0.1,
        "w_3d": np.ones((b3, vidlen), np.float32),
        "w_smpl": (rng.rand(b3, vidlen) > 0.5).astype(np.float32),
        "vidlen_each": np.array([vidlen] * (b3 - 1) + [S + 2], np.float32),
    }
    tree = lambda d: {k: jnp.asarray(v) for k, v in d.items()}
    return tree(batch_2d), tree(batch_3d)


def test_train_segment_runs_and_learns(rng):
    hp = TrainHyper(seqlen=6, n_2d=2, n_3d=3, update_theta_rate=0.9,
                    disc_update_steps=2, num_gcn_scales=3, num_g3d_scales=2)
    model_cfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=32)
    smpl = synthetic_smpl_model(seed=0, num_verts=64)

    gen_params = tepose_init(jax.random.PRNGKey(0), model_cfg)
    disc_params, disc_state = motion_discriminator_init(
        jax.random.PRNGKey(1), num_gcn_scales=3, num_g3d_scales=2)

    gen_tx = make_optimizer("adam", 1e-4)
    disc_tx = make_optimizer("adam", 1e-4, weight_decay=1e-4)
    gen_opt = gen_tx.init(gen_params)
    disc_opt = disc_tx.init(disc_params)

    num_iters = 4
    seg = make_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx,
                             LossWeights(), num_iters)

    batch_2d, batch_3d = _tiny_batches(rng, hp)
    amass = jnp.asarray(
        rng.randn(num_iters, hp.n_2d + hp.n_3d, hp.seqlen, 85)
        .astype(np.float32) * 0.1)

    gp0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), gen_params)
    out = seg(gen_params, disc_params, disc_state, gen_opt, disc_opt,
              batch_2d, batch_3d, amass, jax.random.PRNGKey(42))
    gen_params, disc_params, disc_state, gen_opt, disc_opt, metrics = out

    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(metrics["gen_loss"]) > 0

    # parameters actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), gen_params, gp0)
    total_move = sum(jax.tree_util.tree_leaves(moved))
    assert total_move > 0

    # BN running stats were updated
    rm = np.asarray(disc_state["data_bn"]["running_mean"])
    assert np.abs(rm).sum() > 0


def test_bf16_compute_gradient_agreement(rng):
    """TrainHyper(compute_dtype='bfloat16') must produce the SAME gradients
    as the f32 path up to bf16 rounding — the gate for shipping the measured
    1.18x mixed-precision training knob. SGD(lr=1) makes the one-step param
    delta equal the (negated) gradient, so comparing deltas compares raw
    gradients; update_theta_rate=1 and a shared PRNG key make the two runs
    draw identical dropout/sampling masks. fast_encoder=True because that
    is what train.py actually ships (train.py:~126) — the lane-batched
    einsum encoder must be the path the bf16 gate guards."""
    hp = TrainHyper(seqlen=6, n_2d=2, n_3d=3, update_theta_rate=1.0,
                    disc_update_steps=1, num_gcn_scales=3, num_g3d_scales=2)
    model_cfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=32,
                             fast_encoder=True)
    smpl = synthetic_smpl_model(seed=0, num_verts=64)

    gen_params = tepose_init(jax.random.PRNGKey(0), model_cfg)
    disc_params, disc_state = motion_discriminator_init(
        jax.random.PRNGKey(1), num_gcn_scales=3, num_g3d_scales=2)
    gen_tx = make_optimizer("sgd", 1.0)
    disc_tx = make_optimizer("sgd", 1.0)

    batch_2d, batch_3d = _tiny_batches(rng, hp)
    amass = jnp.asarray(
        rng.randn(1, hp.n_2d + hp.n_3d, hp.seqlen, 85)
        .astype(np.float32) * 0.1)

    fresh = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jnp.array(np.asarray(x)), t)  # the segment donates args

    def one_step(compute_dtype):
        h = TrainHyper(**{**hp.__dict__, "compute_dtype": compute_dtype})
        seg = make_train_segment(smpl, model_cfg, h, gen_tx, disc_tx,
                                 LossWeights(), num_iters=1)
        gp0, dp0, ds0 = fresh(gen_params), fresh(disc_params), \
            fresh(disc_state)
        out = seg(gp0, dp0, ds0, gen_tx.init(fresh(gen_params)),
                  disc_tx.init(fresh(disc_params)),
                  batch_2d, batch_3d, amass, jax.random.PRNGKey(7))
        gp, dp, _, _, _, metrics = out
        grad = np.concatenate([
            (np.asarray(a) - np.asarray(b)).ravel() for a, b in zip(
                jax.tree_util.tree_leaves(gp)
                + jax.tree_util.tree_leaves(dp),
                jax.tree_util.tree_leaves(gen_params)
                + jax.tree_util.tree_leaves(disc_params))])
        return grad, metrics

    g32, m32 = one_step(None)
    gbf, mbf = one_step("bfloat16")

    cos = float(np.dot(g32, gbf)
                / (np.linalg.norm(g32) * np.linalg.norm(gbf) + 1e-30))
    assert cos > 0.98, cos
    rel = float(np.linalg.norm(gbf - g32) / (np.linalg.norm(g32) + 1e-30))
    assert rel < 0.2, rel
    # loss values agree to bf16 tolerance and all metrics stay f32-finite
    for k in ("gen_loss", "dis_loss"):
        a, b = float(m32[k]), float(mbf[k])
        assert abs(a - b) / (abs(a) + 1e-9) < 0.05, (k, a, b)
    for k, v in mbf.items():
        assert np.asarray(v).dtype == np.float32 and np.isfinite(float(v)), k


@pytest.mark.parametrize("n_2d,n_3d", [(38, 26), (76, 52)],
                         ids=["batch64", "batch128"])
def test_fast_train_composition_bf16(rng, n_2d, n_3d):
    """The configs/fast_train.yaml composition — large batch (the shipped
    128 = 76 2D + 52 3D split, plus the 64 intermediate) AND
    compute_dtype=bfloat16 together — must keep the same gradient
    agreement and finiteness guarantees the knobs have individually
    (VERDICT r3 #6: the gates must cover the composition, not just the
    parts). Tiny model dims; the real batch splits."""
    hp = TrainHyper(seqlen=6, n_2d=n_2d, n_3d=n_3d, update_theta_rate=1.0,
                    disc_update_steps=1, num_gcn_scales=3, num_g3d_scales=2)
    model_cfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=32,
                             fast_encoder=True)
    smpl = synthetic_smpl_model(seed=0, num_verts=64)

    gen_params = tepose_init(jax.random.PRNGKey(0), model_cfg)
    disc_params, disc_state = motion_discriminator_init(
        jax.random.PRNGKey(1), num_gcn_scales=3, num_g3d_scales=2)
    gen_tx = make_optimizer("sgd", 1.0)
    disc_tx = make_optimizer("sgd", 1.0)

    batch_2d, batch_3d = _tiny_batches(rng, hp)
    amass = jnp.asarray(
        rng.randn(1, hp.n_2d + hp.n_3d, hp.seqlen, 85)
        .astype(np.float32) * 0.1)

    fresh = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jnp.array(np.asarray(x)), t)

    def one_step(compute_dtype):
        h = TrainHyper(**{**hp.__dict__, "compute_dtype": compute_dtype})
        seg = make_train_segment(smpl, model_cfg, h, gen_tx, disc_tx,
                                 LossWeights(), num_iters=1)
        out = seg(fresh(gen_params), fresh(disc_params), fresh(disc_state),
                  gen_tx.init(fresh(gen_params)),
                  disc_tx.init(fresh(disc_params)),
                  batch_2d, batch_3d, amass, jax.random.PRNGKey(7))
        gp, dp, _, _, _, metrics = out
        grad = np.concatenate([
            (np.asarray(a) - np.asarray(b)).ravel() for a, b in zip(
                jax.tree_util.tree_leaves(gp)
                + jax.tree_util.tree_leaves(dp),
                jax.tree_util.tree_leaves(gen_params)
                + jax.tree_util.tree_leaves(disc_params))])
        return grad, metrics

    g32, m32 = one_step(None)
    gbf, mbf = one_step("bfloat16")
    cos = float(np.dot(g32, gbf)
                / (np.linalg.norm(g32) * np.linalg.norm(gbf) + 1e-30))
    assert cos > 0.98, cos
    for k, v in mbf.items():
        assert np.asarray(v).dtype == np.float32 and np.isfinite(float(v)), k
    assert float(np.linalg.norm(gbf)) > 0  # it actually optimizes


def test_plateau_scheduler():
    sch = ReduceLROnPlateau(patience=1, factor=0.5)
    lr = 1.0
    lr = sch.step(10.0, lr)   # best=10
    assert lr == 1.0
    lr = sch.step(10.0, lr)   # bad 1
    assert lr == 1.0
    lr = sch.step(10.0, lr)   # bad 2 > patience -> reduce
    assert lr == 0.5
    lr = sch.step(1.0, lr)    # new best
    assert lr == 0.5


def test_lr_injection():
    tx = make_optimizer("adam", 1e-3)
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    assert abs(get_lr(st) - 1e-3) < 1e-9
    st = set_lr(st, 5e-4)
    assert abs(get_lr(st) - 5e-4) < 1e-9
    # update still works after LR change
    upd, st = tx.update({"w": jnp.ones((3,))}, st, params)
    assert np.all(np.isfinite(np.asarray(upd["w"])))


def test_packed_segment_matches_unpacked(rng):
    """The flat-packed train segment must be numerically identical to the
    pytree one (packing is pure data movement)."""
    from tepose_tpu.train.trainer import make_packed_train_segment

    hp = TrainHyper(seqlen=6, n_2d=2, n_3d=2, update_theta_rate=1.0,
                    disc_update_steps=1, num_gcn_scales=2, num_g3d_scales=2)
    model_cfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=16)
    smpl = synthetic_smpl_model(seed=1, num_verts=48)

    gen_params = tepose_init(jax.random.PRNGKey(0), model_cfg)
    disc_params, disc_state = motion_discriminator_init(
        jax.random.PRNGKey(1), num_gcn_scales=2, num_g3d_scales=2)
    gen_tx = make_optimizer("adam", 1e-4)
    disc_tx = make_optimizer("adam", 1e-4)
    gen_opt = gen_tx.init(gen_params)
    disc_opt = disc_tx.init(disc_params)

    num_iters = 2
    batch_2d, batch_3d = _tiny_batches(rng, hp, vidlen=12)
    amass = jnp.asarray(
        rng.randn(num_iters, 4, hp.seqlen, 85).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(7)

    carry_template = (gen_params, disc_params, disc_state, gen_opt, disc_opt)
    data_template = {"batch_2d": batch_2d, "batch_3d": batch_3d,
                     "amass": amass}
    packed, carry_packer, data_packer = make_packed_train_segment(
        smpl, model_cfg, hp, gen_tx, disc_tx, LossWeights(), num_iters,
        carry_template, data_template)
    # pack to host numpy BEFORE the donating plain call deletes the arrays
    carry_flats = tuple(jnp.asarray(f)
                        for f in carry_packer.pack_np(carry_template))
    data_flats = tuple(jnp.asarray(f)
                       for f in data_packer.pack_np(data_template))

    plain = make_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx,
                               LossWeights(), num_iters)
    out_plain = plain(gen_params, disc_params, disc_state, gen_opt, disc_opt,
                      batch_2d, batch_3d, amass, key)
    new_flats, mvec = packed(carry_flats, data_flats, key)
    names = packed.metric_names()
    packed_metrics = dict(zip(names, np.asarray(mvec).tolist()))

    plain_metrics = {k: float(v) for k, v in out_plain[5].items()}
    for k in plain_metrics:
        np.testing.assert_allclose(packed_metrics[k], plain_metrics[k],
                                   rtol=1e-4, err_msg=k)

    # unpacked carry params equal the plain-path updated params
    trees = carry_packer.unpack_np([np.asarray(f) for f in new_flats])
    gp_packed = trees[0]
    gp_plain = out_plain[0]
    leaf_p = np.asarray(gp_packed["regressor"]["fc1"]["weight"])
    leaf_q = np.asarray(gp_plain["regressor"]["fc1"]["weight"])
    np.testing.assert_allclose(leaf_p, leaf_q, atol=1e-6)


def test_trainloop_fit_and_resume(rng, tmp_path):
    """One epoch through TrainLoop, checkpoint, then resume restores state."""
    import functools

    from tepose_tpu.config import get_cfg_defaults
    from tepose_tpu.data.loaders import get_data_loaders
    from tepose_tpu.train.fit import TrainLoop
    from tepose_tpu.train.trainer import make_packed_train_segment
    from tests.test_datasets import synthetic_2d_db, synthetic_3d_db

    cfg = get_cfg_defaults()
    cfg.TITLE = "repr_wopw_3dpw_model"
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.DATASET.SEQLEN = 6
    cfg.DATASET.VIDLEN = 12
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TRAIN.DATA_2D_RATIO = 0.5
    cfg.TRAIN.DATASETS_2D = ["PoseTrack"]
    cfg.TRAIN.DATASETS_3D = ["MPII3D"]
    cfg.TRAIN.DATASET_EVAL = "ThreeDPW"
    cfg.TRAIN.MOT_DISCR.GCN.num_gcn_scales = 2
    cfg.TRAIN.MOT_DISCR.GCN.num_g3d_scales = 2

    db3, pse3 = synthetic_3d_db(rng, videos=((14, "a"), (14, "b"), (14, "c")))
    db2, pse2 = synthetic_2d_db(rng, clips=((12, "x"), (12, "y"), (12, "z")))
    amass_db = {"vid_name": np.array(["m"] * 60),
                "theta": rng.randn(60, 82).astype(np.float32)}
    over = {"mpii3d": (db3, pse3), "posetrack": (db2, pse2),
            "amass": (amass_db, None), "threedpw": (db3, pse3)}
    loaders = get_data_loaders(cfg, db_overrides=over)

    hp = TrainHyper(seqlen=6, n_2d=2, n_3d=2, num_gcn_scales=2,
                    num_g3d_scales=2)
    model_cfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=16)
    smpl = synthetic_smpl_model(seed=0, num_verts=48)
    gen_params = tepose_init(jax.random.PRNGKey(0), model_cfg)
    disc_params, disc_state = motion_discriminator_init(
        jax.random.PRNGKey(1), num_gcn_scales=2, num_g3d_scales=2)
    gen_tx = make_optimizer("adam", 1e-4)
    disc_tx = make_optimizer("adam", 1e-4)
    factory = functools.partial(make_packed_train_segment, smpl, model_cfg,
                                hp, gen_tx, disc_tx, LossWeights(), 2)
    jreg = (rng.rand(17, 48) ** 4).astype(np.float32)
    jreg /= jreg.sum(1, keepdims=True)

    logdir = str(tmp_path / "exp")
    loop = TrainLoop(cfg=cfg, segment_factory=factory, smpl=smpl,
                     model_cfg=model_cfg, hp=hp, gen_params=gen_params,
                     disc_params=disc_params, disc_state=disc_state,
                     gen_tx=gen_tx, disc_tx=disc_tx, loaders=loaders,
                     j_regressor=jreg, logdir=logdir,
                     num_iters_per_epoch=2)
    loop.fit(end_epoch=1, num_outer=1)

    import os.path as osp
    assert osp.isfile(osp.join(logdir, "checkpoint.npz"))
    assert osp.isfile(osp.join(logdir, "model_best.npz"))
    assert osp.isfile(osp.join(logdir, "best.txt"))
    trained_w = np.asarray(loop.gen_params["regressor"]["fc1"]["weight"])

    # resume into a fresh loop
    cfg2 = cfg.clone()
    cfg2.TRAIN.RESUME = osp.join(logdir, "checkpoint.npz")
    loop2 = TrainLoop(cfg=cfg2, segment_factory=factory, smpl=smpl,
                      model_cfg=model_cfg, hp=hp,
                      gen_params=tepose_init(jax.random.PRNGKey(9),
                                             model_cfg),
                      disc_params=disc_params, disc_state=disc_state,
                      gen_tx=gen_tx, disc_tx=disc_tx, loaders=loaders,
                      j_regressor=jreg, logdir=str(tmp_path / "exp2"),
                      num_iters_per_epoch=2)
    assert loop2.start_epoch == 1
    np.testing.assert_allclose(
        np.asarray(loop2.gen_params["regressor"]["fc1"]["weight"]),
        trained_w, atol=1e-6)
    assert np.isfinite(loop2.best_performance)
    for l in loaders:
        if l is not None:
            l.close()


def test_train_segment_measurement_modes_agree(rng):
    """The bench-breakdown ablations (mode='forward'/'grad') must compute
    the SAME first-window losses as the shipped step (mode='full') — they
    differ only in what happens after the loss, so a 1-iteration segment
    pins that the ablated graphs measure the real computation."""
    hp = TrainHyper(seqlen=6, n_2d=2, n_3d=3, num_gcn_scales=3,
                    num_g3d_scales=2)
    model_cfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=32)
    smpl = synthetic_smpl_model(seed=0, num_verts=64)
    gen_params = tepose_init(jax.random.PRNGKey(0), model_cfg)
    disc_params, disc_state = motion_discriminator_init(
        jax.random.PRNGKey(1), num_gcn_scales=3, num_g3d_scales=2)
    gen_tx = make_optimizer("adam", 1e-4)
    disc_tx = make_optimizer("adam", 1e-4, weight_decay=1e-4)
    gen_opt = gen_tx.init(gen_params)
    disc_opt = disc_tx.init(disc_params)
    batch_2d, batch_3d = _tiny_batches(rng, hp)
    amass = jnp.asarray(
        rng.randn(1, hp.n_2d + hp.n_3d, 6, 85).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(7)

    outs = {}
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731
    for mode in ("full", "grad", "forward"):
        seg = make_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx,
                                 LossWeights(), 1, mode=mode)
        # the segment donates its carry args — hand each mode fresh buffers
        outs[mode] = seg(copy(gen_params), copy(disc_params),
                         copy(disc_state), copy(gen_opt), copy(disc_opt),
                         batch_2d, batch_3d, amass, key)[5]
    for mode in ("grad", "forward"):
        for k in ("gen_loss", "dis_loss"):
            np.testing.assert_allclose(
                float(outs[mode][k]), float(outs["full"][k]), rtol=1e-5,
                err_msg=f"{mode}:{k}")
    g = float(outs["grad"]["grad_keepalive"])
    assert np.isfinite(g)

    import pytest

    with pytest.raises(ValueError, match="mode"):
        make_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx,
                           LossWeights(), 1, mode="bogus")


def test_train_segment_bitwise_deterministic(rng):
    """Same seed + same inputs -> bit-identical params and metrics. The
    reference has no reproducibility story (SURVEY §5: no seeding
    discipline); here the whole segment is one XLA program with explicit
    PRNG threading, so runs must agree EXACTLY, not approximately."""
    hp = TrainHyper(seqlen=6, n_2d=2, n_3d=3, num_gcn_scales=3,
                    num_g3d_scales=2)
    model_cfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=32)
    smpl = synthetic_smpl_model(seed=0, num_verts=64)
    gen_params = tepose_init(jax.random.PRNGKey(0), model_cfg)
    disc_params, disc_state = motion_discriminator_init(
        jax.random.PRNGKey(1), num_gcn_scales=3, num_g3d_scales=2)
    gen_tx = make_optimizer("adam", 1e-4)
    disc_tx = make_optimizer("adam", 1e-4, weight_decay=1e-4)
    batch_2d, batch_3d = _tiny_batches(rng, hp)
    amass = jnp.asarray(
        rng.randn(3, hp.n_2d + hp.n_3d, 6, 85).astype(np.float32) * 0.1)
    seg = make_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx,
                             LossWeights(), 3)

    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731

    def run():
        out = seg(copy(gen_params), copy(disc_params), copy(disc_state),
                  copy(gen_tx.init(gen_params)),
                  copy(disc_tx.init(disc_params)),
                  batch_2d, batch_3d, amass, jax.random.PRNGKey(7))
        return out[0], out[5]

    p1, m1 = run()
    p2, m2 = run()
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in m1:
        np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]),
                                      err_msg=k)


def test_train_segment_disc_ablation(rng):
    """`ablate="disc"` (the bench_notes in-situ attribution knob) must keep
    every non-discriminator loss term IDENTICAL to the real step — the
    surrogate only zeroes the adversarial terms — and must not touch the
    generator's keypoint/SMPL learning signal."""
    hp = TrainHyper(seqlen=6, n_2d=2, n_3d=3, num_gcn_scales=3,
                    num_g3d_scales=2)
    model_cfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=32)
    smpl = synthetic_smpl_model(seed=0, num_verts=64)
    gen_params = tepose_init(jax.random.PRNGKey(0), model_cfg)
    disc_params, disc_state = motion_discriminator_init(
        jax.random.PRNGKey(1), num_gcn_scales=3, num_g3d_scales=2)
    gen_tx = make_optimizer("adam", 1e-4)
    disc_tx = make_optimizer("adam", 1e-4, weight_decay=1e-4)
    batch_2d, batch_3d = _tiny_batches(rng, hp)
    amass = jnp.asarray(
        rng.randn(1, hp.n_2d + hp.n_3d, 6, 85).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(7)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731

    outs = {}
    for ab in (None, "disc"):
        seg = make_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx,
                                 LossWeights(), 1, mode="forward",
                                 ablate=ab)
        outs[ab] = seg(copy(gen_params), copy(disc_params),
                       copy(disc_state), copy(gen_tx.init(gen_params)),
                       copy(disc_tx.init(disc_params)),
                       batch_2d, batch_3d, amass, key)[5]
    # non-adversarial terms bit-agree; adversarial terms are the surrogate's
    for k in ("loss_kp_2d", "loss_kp_3d", "loss_pose", "loss_shape"):
        np.testing.assert_array_equal(
            np.asarray(outs[None][k]), np.asarray(outs["disc"][k]),
            err_msg=k)
    assert float(outs["disc"]["d_m_disc_fake"]) == 0.0

    with pytest.raises(ValueError, match="ablate"):
        make_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx,
                           LossWeights(), 1, ablate="bogus")


def test_shared_fake_disc_grad_parity(rng):
    """share_fake_disc=True (one fake-motion discriminator forward with a
    cotangent-routing custom_vjp) must produce the SAME losses, gradients
    and updated params as the literal two-call structure the reference
    executes — it is an execution fusion, not an algorithm change."""
    model_cfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=32)
    smpl = synthetic_smpl_model(seed=0, num_verts=64)
    gen_params = tepose_init(jax.random.PRNGKey(0), model_cfg)
    disc_params, disc_state = motion_discriminator_init(
        jax.random.PRNGKey(1), num_gcn_scales=3, num_g3d_scales=2)
    gen_tx = make_optimizer("adam", 1e-4)
    disc_tx = make_optimizer("adam", 1e-4, weight_decay=1e-4)
    amass = jnp.asarray(
        rng.randn(2, 5, 6, 85).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(7)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731

    outs = {}
    for shared in (False, True):
        hp = TrainHyper(seqlen=6, n_2d=2, n_3d=3, num_gcn_scales=3,
                        num_g3d_scales=2, share_fake_disc=shared)
        batch_2d, batch_3d = _tiny_batches(
            np.random.RandomState(0), hp)
        seg = make_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx,
                                 LossWeights(), 2)
        outs[shared] = seg(copy(gen_params), copy(disc_params),
                           copy(disc_state), copy(gen_tx.init(gen_params)),
                           copy(disc_tx.init(disc_params)),
                           batch_2d, batch_3d, amass, key)
    # metrics (losses) agree to float tolerance
    for k in outs[True][5]:
        np.testing.assert_allclose(
            float(outs[True][5][k]), float(outs[False][5][k]),
            rtol=2e-5, atol=1e-6, err_msg=k)
    # updated params of BOTH nets agree (i.e. every gradient agreed):
    # after 2 Adam steps any gradient rerouting error would diverge them
    for i, name in ((0, "gen"), (1, "disc")):
        la = jax.tree_util.tree_leaves(outs[True][i])
        lb = jax.tree_util.tree_leaves(outs[False][i])
        for a, b in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-4, atol=2e-6, err_msg=name)
    # BN running stats follow the same double-EMA trajectory
    for a, b in zip(jax.tree_util.tree_leaves(outs[True][2]),
                    jax.tree_util.tree_leaves(outs[False][2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)

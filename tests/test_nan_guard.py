"""NaNGuard failure detection: persistent non-finite losses must roll the
training state back to the last checkpoint (and halt when none exists).
The reference only prints on NaN (ref: trainer.py:285-287)."""

import os
import os.path as osp
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tepose_tpu.config import get_cfg_defaults
from tepose_tpu.data.loaders import get_data_loaders
from tepose_tpu.models.gcn import motion_discriminator_init
from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import TePoseConfig, tepose_init
from tepose_tpu.train.fit import TrainLoop
from tepose_tpu.train.loss import LossWeights
from tepose_tpu.train.optim import make_optimizer
from tepose_tpu.train.trainer import TrainHyper, make_packed_train_segment


class _NaNSegment:
    """Stand-in segment returning untouched carry + all-NaN metrics."""

    def __init__(self, names):
        self._names = names

    def __call__(self, carry_flats, data_flats, rng):
        return carry_flats, jnp.full((len(self._names),), jnp.nan)

    def metric_names(self):
        return self._names


def test_nanguard_rollback_then_halt(rng, tmp_path):
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
    cfg.DEBUG = False

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
    gen_tx = make_optimizer("adam", 1e-3)
    disc_tx = make_optimizer("adam", 1e-3)
    factory = functools.partial(make_packed_train_segment, smpl, model_cfg,
                                hp, gen_tx, disc_tx, LossWeights(), 2)
    jreg = (rng.rand(17, 48) ** 4).astype(np.float32)
    jreg /= jreg.sum(1, keepdims=True)

    logdir = str(tmp_path / "exp")
    loop = TrainLoop(cfg=cfg, segment_factory=factory, smpl=smpl,
                     model_cfg=model_cfg, hp=hp, gen_params=gen_params,
                     disc_params=disc_params, disc_state=disc_state,
                     gen_tx=gen_tx, disc_tx=disc_tx, loaders=loaders,
                     j_regressor=jreg, logdir=logdir, num_iters_per_epoch=2)
    try:
        loop.fit(end_epoch=1, num_outer=1)  # 1 real epoch -> checkpoint.npz
        from tepose_tpu.utils.logging import MetricWriter

        loop.writer = MetricWriter(logdir)  # fit() closed the writer
        ckpt_w = np.asarray(
            loop.gen_params["regressor"]["fc1"]["weight"]).copy()

        # diverge the live params from the checkpoint with one more epoch
        loop.train_epoch(epoch=1, num_outer=1)
        loop._sync_carry_to_host()
        diverged = np.asarray(loop.gen_params["regressor"]["fc1"]["weight"])
        assert np.abs(diverged - ckpt_w).max() > 0

        # inject 3 consecutive NaN segments -> NaNGuard rollback
        loop.segment = _NaNSegment(loop.segment.metric_names())
        loop.train_epoch(epoch=2, num_outer=3)
        loop._sync_carry_to_host()
        np.testing.assert_allclose(
            np.asarray(loop.gen_params["regressor"]["fc1"]["weight"]),
            ckpt_w, atol=1e-6)
        assert loop.nan_guard.consecutive == 0  # guard reset after rollback

        # without any checkpoint to restore, persistent NaNs must HALT
        os.remove(osp.join(logdir, "checkpoint.npz"))
        with pytest.raises(RuntimeError, match="halting"):
            loop.train_epoch(epoch=3, num_outer=3)
    finally:
        for l in loaders:
            if l is not None:
                l.close()

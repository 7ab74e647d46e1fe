"""Dataset/loader tests over synthetic in-memory DBs."""

import numpy as np

from tepose_tpu.config import get_cfg_defaults
from tepose_tpu.data.datasets import AMASS, Dataset2D, Dataset3D
from tepose_tpu.data.loaders import BatchLoader, get_data_loaders


def synthetic_3d_db(rng, videos=((20, "a"), (9, "b"), (30, "c")),
                    with_smpl=True):
    total = sum(n for n, _ in videos)
    names = np.concatenate(
        [np.array([f"vid_{v}"] * n) for n, v in videos])
    db = {
        "vid_name": names,
        "features": rng.randn(total, 2048).astype(np.float16),
        "joints2D": rng.uniform(0, 224, (total, 49, 3)).astype(np.float32),
        "joints3D": rng.randn(total, 49, 3).astype(np.float32),
        "bbox": np.tile(np.array([112.0, 112.0, 100.0, 200.0], np.float32),
                        (total, 1)),
    }
    if with_smpl:
        db["pose"] = rng.randn(total, 72).astype(np.float32) * 0.2
        db["shape"] = rng.randn(total, 10).astype(np.float32) * 0.2
    pse = rng.randn(total, 85).astype(np.float32) * 0.2
    return db, pse


def synthetic_2d_db(rng, clips=((12, "x"), (10, "y"), (14, "z"))):
    total = sum(n for n, _ in clips)
    names = np.concatenate([np.array([f"clip_{v}"] * n) for n, v in clips])
    db = {
        "vid_name": names,
        "features": rng.randn(total, 2048).astype(np.float16),
        # posetrack DBs store spin-format 49-joint keypoints (converted at
        # preprocessing time, ref: posetrack_utils.py)
        "joints2D": rng.uniform(0, 224, (total, 49, 3)).astype(np.float32),
        "bbox": np.tile(np.array([112.0, 112.0, 100.0, 200.0], np.float32),
                        (total, 1)),
    }
    pse = rng.randn(total, 85).astype(np.float32) * 0.2
    return db, pse


def test_dataset3d_train_item(rng):
    db, pse = synthetic_3d_db(rng)
    ds = Dataset3D("repr_wopw_3dpw_model", "train", seqlen=6, vidlen=16,
                   dataset_name="3dpw", db=db, psetheta=pse)
    assert len(ds) == 3  # all videos >= seqlen frames are kept

    item = ds[0]
    assert item["features"].shape == (16, 2048)
    assert item["theta"].shape == (16, 85)
    assert item["kp_2d"].shape == (16, 49, 3)
    assert item["kp_3d"].shape == (16, 49, 3)
    assert item["vidlen_each"] == 16.0  # 20-frame video clamped to 16
    # theta cam is the dummy [1,0,0]
    np.testing.assert_array_equal(item["theta"][0, :3], [1, 0, 0])
    # normalized keypoints within sane range
    assert np.abs(item["kp_2d"][..., :2]).max() < 3.0


def test_dataset3d_eval_item_h36m(rng):
    db, pse = synthetic_3d_db(rng, with_smpl=True)
    ds = Dataset3D("repr_wopw_h36m_model", "val", seqlen=6, vidlen=16,
                   dataset_name="h36m", db=db, psetheta=pse)
    item = ds[0]
    # eval h36m converts to 14-joint common, no SMPL supervision
    assert item["kp_3d"].shape[1] == 14
    assert item["w_smpl"].sum() == 0


def test_dataset2d_item(rng):
    db, pse = synthetic_2d_db(rng)
    ds = Dataset2D("repr_wopw_3dpw_model", seqlen=6, vidlen=20,
                   dataset_name="posetrack", db=db, psetheta=pse)
    assert len(ds) >= 1
    item = ds[0]
    assert item["features"].shape == (2, 20, 2048)
    assert item["theta_pseu"].shape == (2, 20, 85)
    assert item["switch_id"].shape == (2, 20)
    assert item["kp_2d"].shape == (20, 49, 3)
    # exactly one active channel per timeline frame
    np.testing.assert_array_equal(item["switch_id"].sum(axis=0),
                                  np.ones(20))
    # pseudo-theta cam forced to [1,0,0] where populated
    ch, off = 0, 0
    assert item["theta_pseu"][0, 0, 0] == 1.0


def test_dataset2d_seqlen_length_clip_keeps_kp_aligned(rng):
    """A later clip of exactly seqlen frames contributes exactly ONE active
    timeline frame; the reference's get_sequence repeat-branch would emit
    seqlen rows there and shift every following clip's keypoints."""
    db, pse = synthetic_2d_db(rng, clips=((8, "x"), (6, "y"), (8, "z")))
    ds = Dataset2D("repr_wopw_3dpw_model", seqlen=6, vidlen=20,
                   dataset_name="posetrack", db=db, psetheta=pse)
    item = ds[0]
    # kp timeline rows: clip x full (8) + clip y's single non-overlap row
    # (1) + clip z minus the seqlen-1 overlap (3) = 12 == vidlen_each; with
    # the repeat-branch bug clip y contributes 6 rows and everything after
    # shifts by 5
    total = int(item["vidlen_each"])
    assert total == 12
    np.testing.assert_array_equal(item["kp_2d"][total:],
                                  np.ones_like(item["kp_2d"][total:]))
    # the last clip's final keypoint row must land at timeline slot
    # total-1, i.e. come from DB row 21 (clip z's last frame)
    from tepose_tpu.data.transforms import (
        normalize_2d_kp, transform_keypoints)
    expect = db["joints2D"][21].copy()
    expect[..., :2] = normalize_2d_kp(transform_keypoints(
        expect[None, ..., :2], db["bbox"][21][None]))[0]
    np.testing.assert_allclose(item["kp_2d"][total - 1], expect, atol=1e-5)


def test_batchloader_surfaces_producer_failure():
    class Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise IndexError("malformed DB row")

    loader = BatchLoader(Boom(), batch_size=2, seed=0)
    import pytest

    with pytest.raises(RuntimeError, match="producer"):
        next(iter(loader))
    loader.close()


def test_get_data_loaders_degenerate_split_raises(rng):
    import pytest

    cfg = get_cfg_defaults()
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TRAIN.DATA_2D_RATIO = 1.0  # n_3d = 0
    with pytest.raises(ValueError, match="degenerate"):
        get_data_loaders(cfg)


def test_amass_items(rng):
    total = 40
    db = {
        "vid_name": np.array(["m0"] * 25 + ["m1"] * 15),
        "theta": rng.randn(total, 82).astype(np.float32) * 0.2,
    }
    ds = AMASS(seqlen=6, db=db)
    assert len(ds) == 25 // 6 + 15 // 6
    item = ds[0]
    assert item["theta"].shape == (6, 85)
    np.testing.assert_array_equal(item["theta"][:, :3],
                                  np.tile([1, 0, 0], (6, 1)))


def test_batchloader_cycles(rng):
    db, pse = synthetic_3d_db(rng)
    ds = Dataset3D("repr_wopw_3dpw_model", "train", seqlen=6, vidlen=16,
                   dataset_name="3dpw", db=db, psetheta=pse)
    loader = BatchLoader(ds, batch_size=2, seed=0)
    it = iter(loader)
    seen = 0
    for batch in it:
        assert batch["features"].shape == (2, 16, 2048)
        seen += 1
        if seen >= 3:  # more than one epoch (len==1) -> cycling works
            break
    loader.close()


def test_get_data_loaders_with_overrides(rng):
    cfg = get_cfg_defaults()
    cfg.TITLE = "repr_wopw_3dpw_model"
    cfg.DATASET.SEQLEN = 6
    cfg.DATASET.VIDLEN = 16
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TRAIN.DATA_2D_RATIO = 0.5
    cfg.TRAIN.DATASETS_2D = ["PoseTrack"]
    cfg.TRAIN.DATASETS_3D = ["MPII3D"]
    cfg.TRAIN.DATASET_EVAL = "ThreeDPW"

    db3, pse3 = synthetic_3d_db(rng)
    db2, pse2 = synthetic_2d_db(rng)
    amass_db = {"vid_name": np.array(["m"] * 40),
                "theta": rng.randn(40, 82).astype(np.float32)}
    over = {
        "mpii3d": (db3, pse3),
        "posetrack": (db2, pse2),
        "amass": (amass_db, None),
        "threedpw": (db3, pse3),
    }
    t2d, t3d, disc, valid = get_data_loaders(cfg, db_overrides=over)
    b2 = next(iter(t2d))
    b3 = next(iter(t3d))
    bd = next(iter(disc))
    assert b2["features"].shape[0] == 2
    assert b3["features"].shape[0] == 2
    assert bd["theta"].shape == (4, 6, 85)
    bv = next(iter(valid))
    assert bv["features"].ndim == 3
    for l in (t2d, t3d, disc, valid):
        l.close()

"""Data-pipeline parity against the reference's OWN dataset classes.

Like test_reference_parity.py (models) and test_reference_eval_parity.py
(loss/metrics), these tests import the actual classes from /root/reference —
`lib.dataset.dataset_3d.Dataset3D` (dataset_3d.py:35),
`lib.dataset.dataset_2d.Dataset2D` (dataset_2d.py:35),
`lib.dataset.amass.AMASS` (amass.py:26) — feed both sides the same synthetic
DB files on disk, and assert every tensor of every item matches. This pins
the chunking/windowing, the bbox keypoint transform + [-1,1] normalisation,
the per-dataset supervision masks, the 2-channel clip packing with switch_id,
and the per-config DB filename matrix (both sides must resolve the same file
names from (load_opt, dataset, split) or the loads themselves diverge).

Tolerance note: the reference quantises features/theta/kp tensors through
float16 staging buffers (dataset_3d.py:197-248); ours stay float32, so
comparisons allow f16 rounding (~1e-3 absolute at the value scales used).
"""

import os.path as osp

import joblib
import numpy as np
import pytest

import reference_shims as shims
from tepose_tpu.data.datasets import AMASS, Dataset2D, Dataset3D

SEQLEN = 6


@pytest.fixture(scope="module")
def ref_data_env():
    shims.install_reference()
    yield


def _write_db(tmp_path, name, db, psetheta=None):
    joblib.dump(db, osp.join(tmp_path, f"{name}_db.pt"))
    if psetheta is not None:
        joblib.dump(psetheta, osp.join(tmp_path, f"{name}_pseudotheta.pt"))


def _synthetic_3d_db(rng, lengths, n_kp2, n_kp3):
    n = sum(lengths)
    vid_name = np.concatenate(
        [np.array([f"vid_{i}"] * ln) for i, ln in enumerate(lengths)])
    bbox = np.stack([rng.rand(n) * 200 + 300, rng.rand(n) * 200 + 300,
                     rng.rand(n) * 100 + 150, rng.rand(n) * 100 + 150],
                    axis=1).astype(np.float32)
    kp2 = np.concatenate(
        [bbox[:, None, :2] + rng.randn(n, n_kp2, 2).astype(np.float32) * 40,
         rng.rand(n, n_kp2, 1).astype(np.float32)], axis=2)
    return {
        "vid_name": vid_name,
        "frame_id": np.arange(n),
        "img_name": np.array([f"img_{i}.jpg" for i in range(n)]),
        "joints2D": kp2,
        "joints3D": rng.randn(n, n_kp3, 3).astype(np.float32) * 0.3,
        "pose": rng.randn(n, 72).astype(np.float32) * 0.2,
        "shape": rng.randn(n, 10).astype(np.float32) * 0.2,
        "bbox": bbox,
        "valid": np.ones(n, np.float32),
        "features": rng.randn(n, 2048).astype(np.float32) * 0.1,
    }


def _assert_items_match(ours, ref, keys, atol=2e-3):
    for k in keys:
        r = ref[k].numpy() if hasattr(ref[k], "numpy") else np.asarray(ref[k])
        o = np.asarray(ours[k], np.float32).reshape(r.shape)
        np.testing.assert_allclose(o, r.astype(np.float32), atol=atol,
                                   err_msg=k)


@pytest.mark.parametrize("dataset,load_opt", [
    ("3dpw", "repr_wpw_h36m_mpii3d_model"),   # plain DB names, w_smpl=1
    ("h36m", "repr_wpw_3dpw_model"),          # 25fps_occ names, w_smpl=0 quirk
])
def test_dataset3d_train_items_match_reference(ref_data_env, tmp_path,
                                               monkeypatch, dataset,
                                               load_opt):
    import lib.dataset.dataset_3d as ref_mod

    rng = np.random.RandomState(0)
    lengths = [30, 22]          # vidlen=28 clamps the first video
    vidlen = 28
    n_kp2 = 14 if dataset == "3dpw" else 49
    db = _synthetic_3d_db(rng, lengths, n_kp2=n_kp2, n_kp3=49)
    pse = rng.randn(sum(lengths), 85).astype(np.float32) * 0.2

    # write under the REFERENCE's expected names (its load_db matrix,
    # dataset_3d.py:93-153); our train_db_paths must resolve identically
    variant = "" if dataset == "3dpw" else "_25fps_occ"
    _write_db(str(tmp_path), f"{dataset}_train{variant}", db, pse)
    monkeypatch.setattr(ref_mod, "TePose_DB_DIR", str(tmp_path))

    ref_ds = ref_mod.Dataset3D(load_opt=load_opt, set="train", seqlen=SEQLEN,
                               vidlen=vidlen, dataset_name=dataset)
    our_ds = Dataset3D(load_opt=load_opt, split="train", seqlen=SEQLEN,
                       vidlen=vidlen, dataset_name=dataset,
                       db_dir=str(tmp_path))

    assert len(our_ds) == len(ref_ds) == len(lengths)
    for i in range(len(ref_ds)):
        _assert_items_match(
            our_ds[i], ref_ds[i],
            ["features", "theta", "theta_pseu", "kp_2d", "kp_3d",
             "w_smpl", "w_3d", "index", "vidlen_each"])


@pytest.mark.parametrize("dataset", ["3dpw", "mpii3d"])
def test_dataset3d_val_items_match_reference(ref_data_env, tmp_path,
                                             monkeypatch, dataset):
    """val split: split_into_videos_val windowing, per-dataset kp_3d
    conversion (raw 14-joint for 3dpw, spin->mpii3d_test 17 for mpii3d),
    zeroed SMPL labels, and the `valid` key conventions."""
    import lib.dataset.dataset_3d as ref_mod

    rng = np.random.RandomState(3)
    lengths = [18, 25]
    n_kp3 = 14 if dataset == "3dpw" else 49
    n_kp2 = 14 if dataset == "3dpw" else 49
    db = _synthetic_3d_db(rng, lengths, n_kp2=n_kp2, n_kp3=n_kp3)
    db["valid_i"] = (rng.rand(sum(lengths), 1) > 0.3).astype(np.float32)
    pse = rng.randn(sum(lengths), 85).astype(np.float32) * 0.2

    variant = "" if dataset == "3dpw" else "_scale12"
    _write_db(str(tmp_path), f"{dataset}_val{variant}", db, pse)
    monkeypatch.setattr(ref_mod, "TePose_DB_DIR", str(tmp_path))

    ref_ds = ref_mod.Dataset3D(load_opt="repr_wpw_h36m_mpii3d_model",
                               set="val", seqlen=SEQLEN, vidlen=520,
                               dataset_name=dataset)
    our_ds = Dataset3D(load_opt="repr_wpw_h36m_mpii3d_model", split="val",
                       seqlen=SEQLEN, vidlen=520, dataset_name=dataset,
                       db_dir=str(tmp_path))

    assert len(our_ds) == len(ref_ds) == len(lengths)
    for i in range(len(ref_ds)):
        _assert_items_match(
            our_ds[i], ref_ds[i],
            ["features", "theta", "theta_pseu", "kp_2d", "kp_3d",
             "w_smpl", "w_3d", "index", "vidlen_each", "valid"])


def test_dataset2d_posetrack_items_match_reference(ref_data_env, tmp_path,
                                                   monkeypatch):
    import lib.dataset.dataset_2d as ref_mod

    rng = np.random.RandomState(1)
    lengths = [12, 9, 14, 8]    # packs into 2 two-channel items at vidlen=20
    vidlen = 20
    db = _synthetic_3d_db(rng, lengths, n_kp2=49, n_kp3=49)
    pse = rng.randn(sum(lengths), 85).astype(np.float32) * 0.2

    _write_db(str(tmp_path), "posetrack_train", db, pse)
    monkeypatch.setattr(ref_mod, "TePose_DB_DIR", str(tmp_path))

    ref_ds = ref_mod.Dataset2D(load_opt="repr_wpw_h36m_mpii3d_model",
                               seqlen=SEQLEN, vidlen=vidlen,
                               dataset_name="posetrack")
    our_ds = Dataset2D(load_opt="repr_wpw_h36m_mpii3d_model", seqlen=SEQLEN,
                       vidlen=vidlen, dataset_name="posetrack",
                       db_dir=str(tmp_path))

    assert len(our_ds) == len(ref_ds) == 2
    for i in range(len(ref_ds)):
        _assert_items_match(
            our_ds[i], ref_ds[i],
            ["features", "theta_pseu", "kp_2d", "switch_id", "vidlen_each"])


def test_insta_items_match_reference(ref_data_env, tmp_path, monkeypatch):
    """Insta (HDF5): same 2-channel packing as Dataset2D but the keypoints
    are stored in 224-crop coordinates — NO bbox transform, just [-1,1]
    normalisation (ref: insta.py:96-97), and the insta->spin conversion."""
    h5py = pytest.importorskip("h5py")
    import lib.dataset.insta as ref_mod

    from tepose_tpu.data.datasets import Insta

    rng = np.random.RandomState(4)
    lengths = [12, 9, 14, 8]
    vidlen = 20
    n = sum(lengths)
    vid_name = np.concatenate(
        [np.array([f"vid_{i}".encode()] * ln)
         for i, ln in enumerate(lengths)])
    feats = rng.randn(n, 2048).astype(np.float32) * 0.1
    kp = np.concatenate(
        [rng.rand(n, 25, 2).astype(np.float32) * 224,
         rng.rand(n, 25, 1).astype(np.float32)], axis=2)

    h5_path = osp.join(str(tmp_path), "insta_train_db.h5")
    with h5py.File(h5_path, "w") as f:
        f.create_dataset("vid_name", data=vid_name)
        f.create_dataset("features", data=feats)
        f.create_dataset("joints2D", data=kp)
    pse = rng.randn(n, 85).astype(np.float32) * 0.2
    joblib.dump(pse, osp.join(str(tmp_path), "insta_train_pseudotheta.pt"))
    monkeypatch.setattr(ref_mod, "TePose_DB_DIR", str(tmp_path))

    ref_ds = ref_mod.Insta(load_opt="repr_wpw_h36m_mpii3d_model",
                           seqlen=SEQLEN, vidlen=vidlen)
    our_ds = Insta(load_opt="repr_wpw_h36m_mpii3d_model", seqlen=SEQLEN,
                   vidlen=vidlen, h5_path=h5_path)

    assert len(our_ds) == len(ref_ds) == 2
    for i in range(len(ref_ds)):
        _assert_items_match(
            our_ds[i], ref_ds[i],
            ["features", "theta_pseu", "kp_2d", "switch_id", "vidlen_each"])


def test_amass_items_match_reference(ref_data_env, tmp_path, monkeypatch):
    import lib.dataset.amass as ref_mod

    rng = np.random.RandomState(2)
    n = 40
    db = {
        "vid_name": np.concatenate([np.array(["a"] * 25), np.array(["b"] * 15)]),
        "theta": rng.randn(n, 82).astype(np.float32) * 0.2,
    }
    joblib.dump(db, osp.join(str(tmp_path), "amass_db.pt"))
    monkeypatch.setattr(ref_mod, "TePose_DB_DIR", str(tmp_path))

    ref_ds = ref_mod.AMASS(seqlen=SEQLEN)
    our_ds = AMASS(seqlen=SEQLEN, db={k: v.copy() for k, v in db.items()})

    assert len(our_ds) == len(ref_ds)
    for i in range(len(ref_ds)):
        _assert_items_match(our_ds[i], ref_ds[i], ["theta"], atol=1e-6)

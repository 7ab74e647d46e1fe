"""Shared plumbing for the offline DB builders.

ref: lib/data_utils/* share the same output contract — a joblib dict of
per-frame arrays {vid_name, frame_id, img_name, joints2D, joints3D, pose,
shape, bbox, valid, features} written to `<TEPOSE_DB_DIR>/<name>_db.pt`.
"""

from __future__ import annotations

import os
import os.path as osp
import sys
from typing import Dict, Optional

import joblib
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from tepose_tpu.config import BASE_DATA_DIR, TePose_DB_DIR  # noqa: E402


def load_backbone():
    """SPIN ResNet-50 weights from the converted checkpoint."""
    from tepose_tpu.train.checkpoint import load_checkpoint

    path = osp.join(BASE_DATA_DIR, "spin_model_checkpoint.npz")
    if not osp.isfile(path):
        raise FileNotFoundError(
            f"{path} missing — convert spin_model_checkpoint.pth.tar with "
            "tools/convert_checkpoint.py --kind spin")
    return load_checkpoint(path)[0]["backbone"]


def load_smpl(gender: str = "neutral"):
    from tepose_tpu.models.smpl import load_smpl_assets

    path = osp.join(BASE_DATA_DIR, f"smpl_{gender}.npz")
    if not osp.isfile(path):
        raise FileNotFoundError(
            f"{path} missing — convert your SMPL pkl with "
            "tools/convert_smpl.py")
    return load_smpl_assets(path)


def load_h36m_regressor() -> np.ndarray:
    path = osp.join(BASE_DATA_DIR, "J_regressor_h36m.npy")
    if not osp.isfile(path):
        raise FileNotFoundError(f"{path} missing")
    return np.load(path).astype(np.float32)


def save_db(dataset: Dict[str, np.ndarray], name: str,
            db_dir: Optional[str] = None) -> str:
    d = db_dir or TePose_DB_DIR
    os.makedirs(d, exist_ok=True)
    path = osp.join(d, f"{name}_db.pt")
    for k, v in dataset.items():
        print(f"  {k}: {np.asarray(v).shape}")
    joblib.dump(dataset, path)
    print(f"Saved DB to {path}")
    return path


def concatenate_db(dataset: Dict[str, list]) -> Dict[str, np.ndarray]:
    return {k: np.concatenate(v) for k, v in dataset.items() if len(v)}

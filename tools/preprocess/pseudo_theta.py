#!/usr/bin/env python
"""Generate pseudo-theta files (`<name>_pseudotheta.pt`) by running the
pretrained VIBE over every video's stored features.

ref: lib/data_utils/pseudo_theta.py:39-121 — per video, features are fed in
450-frame chunks (the final partial chunk re-reads the last 450 frames and
keeps only the tail); output is a flat (N, 85) theta array aligned with the
DB's frame order.

Usage:
  python tools/preprocess/pseudo_theta.py --file_name 3dpw_test
         [--vibe_batch_size 450] [--vibe_ckpt data/base_data/vibe_w_3dpw.npz]
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from common import BASE_DATA_DIR, TePose_DB_DIR  # noqa: E402


def pseudo_thetas_for_features(vid_names: np.ndarray, features,
                               vibe_params, smpl, vibe_cfg,
                               batch_size: int = 450) -> np.ndarray:
    """Compute (N, 85) pseudo thetas for a frame-level DB."""
    import jax
    import jax.numpy as jnp

    from tepose_tpu.data.chunking import group_video_indices
    from tepose_tpu.models.tepose import vibe_apply
    from tepose_tpu.utils.packing import FlatPacker, pack_smpl, unpack_smpl

    template = (vibe_params, pack_smpl(smpl))
    packer = FlatPacker(template)
    flats = tuple(jax.device_put(jnp.asarray(f))
                  for f in packer.pack_np(template))

    fns = {}

    def run_chunk(chunk: np.ndarray) -> np.ndarray:
        T = len(chunk)
        if T not in fns:
            @jax.jit
            def fn(flats, feats):
                vp, smpl_t = packer.unpack(flats)
                model = unpack_smpl(smpl, smpl_t)
                return vibe_apply(vp, model, feats, vibe_cfg)["theta"]
            fns[T] = fn
        return np.asarray(
            fns[T](flats, jnp.asarray(chunk[None]))).reshape(T, -1)

    thetas = []
    for idx in group_video_indices(vid_names):
        feats = np.asarray(features[idx[0]:idx[-1] + 1], np.float32)
        n = len(feats)
        for k in range(n // batch_size):
            thetas.append(run_chunk(feats[batch_size * k:
                                          batch_size * (k + 1)]))
        if n % batch_size != 0:
            k = n // batch_size
            tail = feats[max(0, n - batch_size):]
            out = run_chunk(tail)
            thetas.append(out[k * batch_size - n:])
    return np.concatenate(thetas, axis=0)


def main():
    import joblib

    ap = argparse.ArgumentParser()
    ap.add_argument("--file_name", required=True,
                    help="DB stem, e.g. 3dpw_test or h36m_train_25fps_occ")
    ap.add_argument("--vibe_batch_size", type=int, default=450)
    ap.add_argument("--vibe_ckpt",
                    default=osp.join(BASE_DATA_DIR, "vibe_w_3dpw.npz"))
    ap.add_argument("--db_dir", default=None)
    args = ap.parse_args()

    from common import load_smpl
    from tepose_tpu.models.tepose import VibeConfig
    from tepose_tpu.train.checkpoint import load_checkpoint

    d = args.db_dir or TePose_DB_DIR
    db_file = osp.join(d, args.file_name + "_db.pt")
    if osp.isfile(db_file):
        db = joblib.load(db_file)
    elif args.file_name == "insta_train":
        import h5py

        db = h5py.File(osp.join(d, args.file_name + "_db.h5"), "r")
    else:
        raise FileNotFoundError(db_file)

    vibe = load_checkpoint(args.vibe_ckpt)[0]["gen"]
    smpl = load_smpl()
    vcfg = VibeConfig(seqlen=16, n_layers=2, hidden_size=1024,
                      add_linear=True)

    thetas = pseudo_thetas_for_features(
        np.asarray(db["vid_name"]), db["features"], vibe, smpl, vcfg,
        args.vibe_batch_size)
    out_file = osp.join(d, args.file_name + "_pseudotheta.pt")
    joblib.dump(thetas, out_file)
    print(f"wrote {out_file}: {thetas.shape}")


if __name__ == "__main__":
    main()

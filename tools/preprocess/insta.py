#!/usr/bin/env python
"""Build the InstaVariety DB (`insta_train_db.h5`).

ref: lib/data_utils/insta_utils.py:102-393 — reads the InstaVariety tfrecord
shards (per-frame images + 25-joint 'insta' keypoints), derives keypoint
bboxes, extracts ResNet features, and appends everything to a single HDF5
(the dataset is too large for one in-memory joblib dict).

tfrecord reading uses tensorflow if importable; otherwise a lightweight
tfrecord parser handles the standard Example proto layout.

Usage: python tools/preprocess/insta.py --dir data/insta_variety
"""

import argparse
import glob
import os.path as osp
import struct
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from common import TePose_DB_DIR, load_backbone  # noqa: E402


def iter_tfrecord(path: str):
    """Minimal TFRecord iterator (length-prefixed protobuf records)."""
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                return
            (length,) = struct.unpack("<Q", header[:8])
            payload = f.read(length)
            f.read(4)  # data crc
            yield payload


def read_data(folder: str, out_path: str = None, backbone=None,
              mesh=None) -> str:
    import cv2
    import h5py

    from tepose_tpu.data.preprocess import FeatureExtractor
    from tepose_tpu.ops.filters import kp_to_bbox_param

    try:
        import tensorflow as tf  # noqa: F401
        have_tf = True
    except ImportError:
        have_tf = False

    extractor = FeatureExtractor(backbone if backbone is not None
                                 else load_backbone(), mesh=mesh)
    out_path = out_path or osp.join(TePose_DB_DIR, "insta_train_db.h5")
    records = sorted(glob.glob(osp.join(folder, "train", "*.tfrecord")))
    if not records:
        raise FileNotFoundError(f"no tfrecords under {folder}/train")

    with h5py.File(out_path, "w") as h5:
        dsets = {}

        def append(key, arr):
            arr = np.asarray(arr)
            if key not in dsets:
                dsets[key] = h5.create_dataset(
                    key, data=arr, maxshape=(None,) + arr.shape[1:],
                    chunks=True)
            else:
                d = dsets[key]
                d.resize(d.shape[0] + arr.shape[0], axis=0)
                d[-arr.shape[0]:] = arr

        for ri, rec_path in enumerate(records):
            if have_tf:
                import tensorflow as tf

                it = (r.numpy() for r in
                      tf.data.TFRecordDataset(rec_path))
            else:
                it = iter_tfrecord(rec_path)
            for vi, raw in enumerate(it):
                frames, kps = _parse_example(raw, have_tf)
                if frames is None or len(frames) < 8:
                    continue
                bboxes, keep = [], []
                for t in range(len(frames)):
                    p = kp_to_bbox_param(kps[t], vis_thresh=0.3)
                    if p is None:
                        continue
                    side = 150.0 / p[2] * 1.2
                    bboxes.append([p[0], p[1], side, side])
                    keep.append(t)
                if len(keep) < 8:
                    continue
                imgs = [cv2.imdecode(np.frombuffer(frames[t], np.uint8),
                                     cv2.IMREAD_COLOR)[:, :, ::-1]
                        for t in keep]
                feats = extractor.extract_from_frames(
                    imgs, np.asarray(bboxes, np.float32), scale=1.2)
                n = len(keep)
                vid = f"insta_{ri:04d}_{vi:04d}"
                append("vid_name", np.array([vid.encode()] * n))
                append("frame_id", np.asarray(keep))
                append("joints2D", kps[keep].astype(np.float32))
                append("bbox", np.asarray(bboxes, np.float32))
                append("features", feats)
            print(f"{rec_path} done")
    print(f"wrote {out_path}")
    return out_path


def _read_varint(buf: bytes, pos: int):
    shift = 0
    out = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one protobuf message.
    Only wire types 0 (varint), 2 (length-delimited) and 5 (32-bit) appear
    in tf.train protos."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _parse_feature(buf: bytes):
    """tf.train.Feature -> list of bytes / np.float32 / np.int64 values."""
    for field, wt, val in _iter_fields(buf):
        if field == 1:      # BytesList { repeated bytes value = 1; }
            return [v for f, _, v in _iter_fields(val) if f == 1]
        if field == 2:      # FloatList { repeated float value = 1 [packed]; }
            out = []
            for f, w, v in _iter_fields(val):
                if f != 1:
                    continue
                if w == 2:  # packed
                    out.append(np.frombuffer(v, "<f4"))
                else:       # unpacked 32-bit
                    out.append(np.frombuffer(v, "<f4"))
            return np.concatenate(out) if out else np.zeros(0, np.float32)
        if field == 3:      # Int64List, packed varints
            out = []
            for f, w, v in _iter_fields(val):
                if f != 1:
                    continue
                if w == 2:
                    p = 0
                    while p < len(v):
                        x, p = _read_varint(v, p)
                        out.append(x)
                else:
                    out.append(v)
            return np.asarray(out, np.int64)
    return []


def parse_sequence_example_py(raw: bytes):
    """Pure-python tf.train.SequenceExample decoder (wire format only —
    no tensorflow). Returns {key: [per-step feature values]} for the
    feature_lists map; context features are ignored (the InstaVariety
    reader only needs the per-step lists)."""
    feature_lists = {}
    for field, _, val in _iter_fields(raw):
        if field != 2:  # SequenceExample.feature_lists
            continue
        for f2, _, entry in _iter_fields(val):
            if f2 != 1:  # FeatureLists.feature_list map entry
                continue
            key, flist = None, []
            for f3, _, v3 in _iter_fields(entry):
                if f3 == 1:
                    key = v3.decode()
                elif f3 == 2:  # FeatureList { repeated Feature feature = 1 }
                    for f4, _, v4 in _iter_fields(v3):
                        if f4 == 1:
                            flist.append(_parse_feature(v4))
            if key is not None:
                feature_lists[key] = flist
    return feature_lists


def _parse_example(raw: bytes, have_tf: bool):
    """Decode one InstaVariety SequenceExample: jpeg frames + (T, 25, 3)
    keypoints ('insta' format, ref: insta_utils.py:102-200)."""
    if not have_tf:
        fl = parse_sequence_example_py(raw)
        if "image/encoded" not in fl:
            return None, None
        frames = [v[0] for v in fl["image/encoded"]]
        T = len(frames)
        xys = np.stack([np.asarray(v, np.float32)
                        for v in fl["image/xys"]]).reshape(
            T, 2, -1).transpose(0, 2, 1)
        vis = np.stack([np.asarray(v, np.int64)
                        for v in fl["image/vis"]]).reshape(T, -1, 1)
        kps = np.concatenate([xys, vis.astype(np.float32)], axis=2)
        return frames, kps
    import tensorflow as tf

    ctx_desc = {"meta/N": tf.io.FixedLenFeature([], tf.int64)}
    seq_desc = {
        "image/encoded": tf.io.FixedLenSequenceFeature([], tf.string),
        "image/xys": tf.io.VarLenFeature(tf.float32),
        "image/vis": tf.io.VarLenFeature(tf.int64),
    }
    ctx, seq = tf.io.parse_single_sequence_example(
        raw, context_features=ctx_desc, sequence_features=seq_desc)
    frames = [f.numpy() for f in seq["image/encoded"]]
    xys = tf.sparse.to_dense(seq["image/xys"]).numpy().reshape(
        len(frames), 2, -1).transpose(0, 2, 1)
    vis = tf.sparse.to_dense(seq["image/vis"]).numpy().reshape(
        len(frames), -1, 1)
    kps = np.concatenate([xys, vis.astype(np.float32)], axis=2)
    return frames, kps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="data/insta_variety")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    read_data(args.dir, args.out)


if __name__ == "__main__":
    main()

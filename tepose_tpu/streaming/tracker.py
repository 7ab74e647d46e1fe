"""Multi-person bbox tracking for the demo pipeline.

Replaces the reference's external dependencies (yolov3 + multi-person-tracker
pip packages, demo.py:34,87-100; OpenPose STAF binary, pose_tracker.py):

  * `IoUTracker` — greedy IoU association over per-frame detections, the same
    tracklet output format the reference's MPT produces:
    {person_id: {"bbox": (T, 4) cx,cy,w,h, "frames": (T,)}}.
  * `detect_people_simple` — a detector-free fallback (single full-frame
    person) so the demo runs without any external detector; precomputed
    detections (e.g. from any off-the-shelf detector) can be passed in via
    --detections <npz>.
  * `load_pose_tracklets` — parse OpenPose-style keypoint JSONs into
    tracklets (the `--tracking_method pose` path, ref: pose_tracker.py:52-99).
"""

from __future__ import annotations

import json
import os.path as osp
from glob import glob
from typing import Dict, List, Optional

import numpy as np


def iou_xywh(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of two (cx, cy, w, h) boxes."""
    ax0, ay0 = a[0] - a[2] / 2, a[1] - a[3] / 2
    ax1, ay1 = a[0] + a[2] / 2, a[1] + a[3] / 2
    bx0, by0 = b[0] - b[2] / 2, b[1] - b[3] / 2
    bx1, by1 = b[0] + b[2] / 2, b[1] + b[3] / 2
    ix = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    iy = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = ix * iy
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


class IoUTracker:
    """Greedy frame-to-frame IoU association with track persistence."""

    def __init__(self, iou_thresh: float = 0.3, max_missed: int = 10):
        self.iou_thresh = iou_thresh
        self.max_missed = max_missed
        self._next_id = 0
        self._active: Dict[int, Dict] = {}
        self._finished: Dict[int, Dict] = {}

    def update(self, frame_idx: int, detections: np.ndarray) -> None:
        """detections: (N, 4) (cx, cy, w, h)."""
        detections = np.asarray(detections, np.float32).reshape(-1, 4)
        unmatched = list(range(len(detections)))
        # match existing tracks greedily by IoU with their last box
        for tid in list(self._active.keys()):
            tr = self._active[tid]
            best, best_iou = None, self.iou_thresh
            for di in unmatched:
                i = iou_xywh(tr["bbox"][-1], detections[di])
                if i > best_iou:
                    best, best_iou = di, i
            if best is not None:
                tr["bbox"].append(detections[best])
                tr["frames"].append(frame_idx)
                tr["missed"] = 0
                unmatched.remove(best)
            else:
                tr["missed"] += 1
                if tr["missed"] > self.max_missed:
                    self._finish(tid)
        # new tracks for unmatched detections
        for di in unmatched:
            self._active[self._next_id] = {
                "bbox": [detections[di]], "frames": [frame_idx], "missed": 0}
            self._next_id += 1

    def _finish(self, tid: int) -> None:
        tr = self._active.pop(tid)
        self._finished[tid] = tr

    def tracklets(self, min_length: int = 6) -> Dict[int, Dict]:
        """Finalise and return {id: {'bbox': (T,4), 'frames': (T,)}}."""
        for tid in list(self._active.keys()):
            self._finish(tid)
        out = {}
        for tid, tr in self._finished.items():
            if len(tr["frames"]) < min_length:
                continue
            out[tid] = {
                "bbox": np.stack(tr["bbox"]).astype(np.float32),
                "frames": np.asarray(tr["frames"], np.int64),
            }
        return out


def detect_people_simple(frame_shape, num_frames: int) -> Dict[int, Dict]:
    """Detector-free fallback: one tracklet covering a centered square box
    (suited to single-person footage when no detector is available)."""
    h, w = frame_shape[:2]
    side = min(h, w) * 0.95
    bbox = np.tile(np.array([w / 2, h / 2, side, side], np.float32),
                   (num_frames, 1))
    return {0: {"bbox": bbox, "frames": np.arange(num_frames)}}


def load_detections_npz(path: str, num_frames: int) -> Dict[int, Dict]:
    """Load precomputed per-frame detections and track them.

    npz with arrays `frames` (N,) and `boxes` (N, 4) (cx, cy, w, h), or
    already-tracked `tracklet_{i}_bbox` / `tracklet_{i}_frames` pairs.
    """
    z = np.load(path)
    if "boxes" in z:
        tracker = IoUTracker()
        frames = z["frames"]
        boxes = z["boxes"]
        for f in range(num_frames):
            tracker.update(f, boxes[frames == f])
        return tracker.tracklets()
    out = {}
    i = 0
    while f"tracklet_{i}_bbox" in z:
        out[i] = {"bbox": z[f"tracklet_{i}_bbox"].astype(np.float32),
                  "frames": z[f"tracklet_{i}_frames"].astype(np.int64)}
        i += 1
    return out


def load_pose_tracklets(json_folder: str,
                        vis_thresh: float = 0.3) -> Dict[int, Dict]:
    """Parse OpenPose-format person keypoints JSONs into bbox tracklets.

    ref: lib/utils/pose_tracker.py:52-99 (read_posetrack_keypoints +
    conversion): per-frame people with `person_id` and pose_keypoints_2d;
    boxes derived from visible joints via the 150-px person scaling.
    """
    from tepose_tpu.ops.filters import kp_to_bbox_param

    people: Dict[int, Dict[str, list]] = {}
    files = sorted(glob(osp.join(json_folder, "*.json")))
    for idx, path in enumerate(files):
        with open(path) as f:
            data = json.load(f)
        for person in data.get("people", []):
            pid = int(person.get("person_id", [0])[0]
                      if isinstance(person.get("person_id"), list)
                      else person.get("person_id", 0))
            kp = np.asarray(person["pose_keypoints_2d"],
                            np.float32).reshape(-1, 3)
            p = kp_to_bbox_param(kp, vis_thresh)
            if p is None:
                continue
            entry = people.setdefault(pid, {"bbox": [], "frames": [],
                                            "joints2d": []})
            size = 150.0 / p[2] * 1.2
            entry["bbox"].append([p[0], p[1], size, size])
            entry["frames"].append(idx)
            entry["joints2d"].append(kp)
    return {pid: {"bbox": np.asarray(v["bbox"], np.float32),
                  "frames": np.asarray(v["frames"], np.int64),
                  "joints2d": np.asarray(v["joints2d"], np.float32)}
            for pid, v in people.items() if len(v["frames"]) >= 6}

"""Built-in multi-person detection: background-subtraction proposals + IoU
tracking must find multiple moving people with no external detector
(VERDICT: the reference ships yolov3 via MPT, demo.py:87-100; our demo must
handle >=2 people on raw video out of the box)."""

import os
import os.path as osp

import numpy as np
import pytest


def _two_person_frames(n_frames=60, h=240, w=320, seed=0):
    """Static noisy background + two circles moving on separate paths."""
    import cv2

    rs = np.random.RandomState(seed)
    bg = rs.randint(30, 50, (h, w, 3)).astype(np.uint8)
    frames = []
    for t in range(n_frames):
        img = bg.copy()
        x1 = int(w * 0.25 + 25 * np.sin(t / 9.0))
        y1 = int(h * 0.45 + 10 * np.cos(t / 7.0))
        x2 = int(w * 0.72 + 20 * np.sin(t / 6.0 + 1.5))
        y2 = int(h * 0.55 + 12 * np.sin(t / 11.0))
        cv2.circle(img, (x1, y1), 26, (220, 170, 60), -1)
        cv2.circle(img, (x2, y2), 30, (60, 180, 220), -1)
        frames.append(img)
    return frames


def test_motion_detector_two_people():
    from tepose_tpu.streaming.tracker import detect_people_motion

    frames = _two_person_frames()
    tracklets = detect_people_motion(frames)
    long_tracks = {k: v for k, v in tracklets.items()
                   if len(v["frames"]) >= 25}
    assert len(long_tracks) >= 2, \
        f"expected >=2 tracklets, got {[len(v['frames']) for v in tracklets.values()]}"

    # the two longest tracks sit on opposite halves of the frame
    tracks = sorted(long_tracks.values(), key=lambda v: -len(v["frames"]))[:2]
    cxs = sorted(float(np.median(tr["bbox"][:, 0])) for tr in tracks)
    assert cxs[0] < 160 < cxs[1], cxs


def test_motion_detector_static_scene_empty():
    from tepose_tpu.streaming.tracker import detect_people_motion

    rs = np.random.RandomState(1)
    bg = rs.randint(30, 50, (120, 160, 3)).astype(np.uint8)
    frames = [bg.copy() for _ in range(30)]
    assert detect_people_motion(frames) == {}


def test_demo_two_person_end_to_end(tmp_path, monkeypatch):
    """demo.py on a raw 2-person video with NO external detections produces
    2 tracklets and renders 2 meshes (tiny model sizes for CPU speed)."""
    import sys

    import cv2
    import dataclasses

    import demo as demo_cli
    import tepose_tpu.models.smpl as smpl_mod
    import tepose_tpu.models.tepose as tepose_mod

    # shrink every model the demo builds (sizes are hardcoded flagship)
    orig_smpl = smpl_mod.synthetic_smpl_model
    monkeypatch.setattr(
        smpl_mod, "synthetic_smpl_model",
        lambda seed=0, num_verts=6890: orig_smpl(seed=seed, num_verts=64))
    OrigT, OrigV = tepose_mod.TePoseConfig, tepose_mod.VibeConfig
    monkeypatch.setattr(
        tepose_mod, "TePoseConfig",
        lambda **kw: OrigT(**{**kw, "n_layers": 1, "hidden_size": 16}))
    monkeypatch.setattr(
        tepose_mod, "VibeConfig",
        lambda **kw: OrigV(**{**kw, "n_layers": 1, "hidden_size": 16}))

    vid = str(tmp_path / "two.mp4")
    frames = _two_person_frames(n_frames=40)
    wr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                         (frames[0].shape[1], frames[0].shape[0]))
    for f in frames:
        wr.write(f)
    wr.release()

    out_dir = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "demo.py", "--vid_file", vid, "--output_folder", out_dir,
        "--synthetic", "--save_pkl", "--detector", "motion"])
    demo_cli.main()

    import joblib

    pkl = osp.join(out_dir, "tepose_two_output.pkl")
    assert osp.isfile(pkl), os.listdir(out_dir)
    results = joblib.load(pkl)
    assert len(results) >= 2, f"expected >=2 people, got {list(results)}"
    assert osp.isfile(osp.join(out_dir, "tepose_two_result.mp4"))

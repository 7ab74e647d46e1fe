"""`demo.py --live`: causal person tracker + frame-at-a-time CLI loop.

The offline demo needs the whole clip (detector background, tracklet
batching); --live must produce a pose for frame t from only frames <= t
(after a one-time detector bootstrap). TPU-new capability — the reference
demo is offline-only (ref: demo.py:171-252)."""

import os.path as osp
import sys

import numpy as np


def _moving_person_frames(n_frames=40, h=240, w=320, seed=0):
    """Static noisy background + one circle on a known path."""
    import cv2

    rs = np.random.RandomState(seed)
    bg = rs.randint(30, 50, (h, w, 3)).astype(np.uint8)
    frames, truth = [], []
    for t in range(n_frames):
        img = bg.copy()
        x = int(w * 0.5 + 60 * np.sin(t / 9.0))
        y = int(h * 0.5 + 15 * np.cos(t / 7.0))
        cv2.circle(img, (x, y), 28, (220, 170, 60), -1)
        frames.append(img)
        truth.append((x, y))
    return frames, truth


def test_causal_tracker_bootstrap_and_follow():
    from tepose_tpu.streaming.tracker import CausalPersonTracker

    frames, truth = _moving_person_frames()
    tracker = CausalPersonTracker(bootstrap=10)
    boxes, counts = [], []
    for f in frames:
        out = tracker.update(f)
        counts.append(len(out))
        boxes.extend(list(out))
    assert counts[:9] == [0] * 9          # buffering
    assert counts[9] == 10                # bootstrap drain
    assert all(c == 1 for c in counts[10:])
    boxes = np.stack(boxes)
    assert len(boxes) == len(frames)
    # steady-state boxes follow the moving figure within a person radius
    errs = [np.hypot(boxes[t, 0] - truth[t][0], boxes[t, 1] - truth[t][1])
            for t in range(10, len(frames))]
    assert np.median(errs) < 30, np.median(errs)
    # person-sized, not full-frame
    assert np.median(boxes[10:, 2]) < 150, np.median(boxes[10:, 2])


def test_causal_tracker_flush_short_stream():
    from tepose_tpu.streaming.tracker import CausalPersonTracker

    frames, _ = _moving_person_frames(n_frames=6)
    tracker = CausalPersonTracker(bootstrap=25)
    for f in frames:
        assert len(tracker.update(f)) == 0
    assert len(tracker.flush()) == 6      # end-of-stream drain
    assert len(tracker.flush()) == 0


def test_demo_live_end_to_end(tmp_path, monkeypatch):
    """demo.py --live on a synthetic clip: the causal loop poses and renders
    every frame, and the saved pickle is frame-aligned with correct valid
    flags (first seqlen-1 frames = causal VIBE bootstrap)."""
    import cv2
    import joblib

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

    frames, _ = _moving_person_frames(n_frames=32)
    vid = str(tmp_path / "live.mp4")
    wr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                         (frames[0].shape[1], frames[0].shape[0]))
    for f in frames:
        wr.write(f)
    wr.release()

    out_dir = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "demo.py", "--live", "--vid_file", vid, "--output_folder", out_dir,
        "--synthetic", "--save_pkl", "--live_bootstrap", "10"])
    args = demo_cli.parse_args()
    res = demo_cli.run_live(args, crop_size=64)
    assert res["frames"] == 32

    out = joblib.load(osp.join(out_dir, "tepose_live_live_output.pkl"))[0]
    assert out["theta"].shape == (32, 85)
    assert out["verts"].shape[0] == 32
    assert list(out["valid"][:5]) == [False] * 5
    assert out["valid"][5:].all()
    assert osp.isfile(osp.join(out_dir, "tepose_live_live_result.mp4"))

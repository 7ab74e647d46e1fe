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


def _two_person_churn_frames(n_frames=60, h=240, w=320, seed=0, leave_at=30):
    """Two circles; the second leaves the scene at `leave_at` and a third
    (different path) appears 6 frames later — exercising slot churn."""
    import cv2

    rs = np.random.RandomState(seed)
    bg = rs.randint(30, 50, (h, w, 3)).astype(np.uint8)
    frames, truth = [], []
    for t in range(n_frames):
        img = bg.copy()
        x1 = int(w * 0.25 + 25 * np.sin(t / 9.0))
        y1 = int(h * 0.45 + 10 * np.cos(t / 7.0))
        cv2.circle(img, (x1, y1), 26, (220, 170, 60), -1)
        p2 = None
        if t < leave_at:
            p2 = (int(w * 0.72 + 20 * np.sin(t / 6.0 + 1.5)),
                  int(h * 0.55 + 12 * np.sin(t / 11.0)))
        elif t >= leave_at + 6:
            u = t - leave_at - 6
            p2 = (int(w * 0.70 - 15 * np.sin(u / 5.0)),
                  int(h * 0.30 + 10 * np.cos(u / 9.0)))
        if p2 is not None:
            cv2.circle(img, p2, 30, (60, 180, 220), -1)
        frames.append(img)
        truth.append(((x1, y1), p2))
    return frames, truth


def test_causal_people_tracker_two_slots_and_churn():
    from tepose_tpu.streaming.tracker import CausalPeopleTracker

    frames, truth = _two_person_churn_frames()
    tracker = CausalPeopleTracker(slots=2, bootstrap=12, max_missed=8)
    boxes, present, fresh = [], [], []
    for f in frames:
        b, p, fr = tracker.update(f)
        boxes.extend(list(b))
        present.extend(list(p))
        fresh.extend(list(fr))
    assert len(boxes) == len(frames)
    boxes, present = np.stack(boxes), np.stack(present)
    fresh = np.stack(fresh)

    # both slots occupied while both people are on screen
    assert present[12:28].all(), present[12:28]
    # some slot was re-seeded after the churn window (person 2 left at 30,
    # newcomer at 36) — the fresh flag must fire exactly then, not before
    assert not fresh[:30].any()
    assert fresh[34:50].any(), "newcomer never re-seeded a slot"

    # slot stability: slot following person 1 tracks them throughout
    errs1 = [min(np.hypot(boxes[t, s, 0] - truth[t][0][0],
                          boxes[t, s, 1] - truth[t][0][1])
                 for s in range(2))
             for t in range(12, len(frames))]
    assert np.median(errs1) < 30, np.median(errs1)


def test_causal_people_tracker_keeps_still_person():
    """A person who stops moving must NOT be absorbed as a ghost: the
    appearance template still matches, so the track survives a long freeze
    with no spurious fresh (stream reset)."""
    import cv2

    from tepose_tpu.streaming.tracker import CausalPeopleTracker

    rs = np.random.RandomState(1)
    bg = rs.randint(30, 50, (240, 320, 3)).astype(np.uint8)
    frames = []
    for t in range(70):
        img = bg.copy()
        x = int(80 + 25 * np.sin(min(t, 30) / 9.0))  # freezes at t=30
        y = int(110 + 10 * np.cos(min(t, 30) / 7.0))
        cv2.circle(img, (x, y), 26, (220, 170, 60), -1)
        frames.append(img)

    tracker = CausalPeopleTracker(slots=2, bootstrap=12, max_missed=8)
    present, fresh = [], []
    for f in frames:
        _, p, fr = tracker.update(f)
        present.extend(list(p))
        fresh.extend(list(fr))
    present, fresh = np.stack(present), np.stack(fresh)
    assert present[30:, 0].all(), "still person's track died"
    assert not fresh[12:].any(), "still person caused a spurious reset"


def test_demo_live_two_streams_end_to_end(tmp_path, monkeypatch):
    """demo.py --live --live_streams 2 on a two-person clip with churn:
    per-slot pickle rows stay frame-aligned, presence tracks the scene, and
    the re-seeded slot's validity refills after the reset."""
    import cv2
    import joblib

    import demo as demo_cli
    import tepose_tpu.models.smpl as smpl_mod
    import tepose_tpu.models.tepose as tepose_mod

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

    frames, _ = _two_person_churn_frames(n_frames=48)
    vid = str(tmp_path / "duo.mp4")
    wr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                         (frames[0].shape[1], frames[0].shape[0]))
    for f in frames:
        wr.write(f)
    wr.release()

    out_dir = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "demo.py", "--live", "--live_streams", "2", "--vid_file", vid,
        "--output_folder", out_dir, "--synthetic", "--save_pkl",
        "--live_bootstrap", "12"])
    args = demo_cli.parse_args()
    res = demo_cli.run_live(args, crop_size=64)
    assert res["frames"] == 48

    out = joblib.load(osp.join(out_dir, "tepose_duo_live_output.pkl"))
    assert set(out.keys()) == {0, 1}
    for s in (0, 1):
        assert out[s]["theta"].shape == (48, 85)
        assert out[s]["present"].shape == (48,)
    # both slots present while both people are on screen
    both = out[0]["present"][12:28] & out[1]["present"][12:28]
    assert both.all()

#!/usr/bin/env python
"""In-the-wild video demo — reference-compatible surface.

ref: demo.py (reference). Pipeline per person tracklet: bbox crops ->
ResNet-50 features -> VIBE bootstrap -> TePose sliding-window streaming ->
optional 1-euro smoothing -> mesh overlay render -> output video.

  python demo.py --vid_file video.mp4 [--model ckpt.npz] [--smooth]
                 [--sideview] [--render_plain] [--save_pkl] [--save_obj]
                 [--detections dets.npz | --tracking_method pose
                  --staf_dir <openpose json dir>]
  python demo.py --synthetic          # smoke-run on a generated video
  python demo.py --live --vid_file cam:0   # causal frame-at-a-time serving
                                      # (pose for frame t as frame t lands)

Person detection is built in and auto-selected: a background-subtraction
motion detector for static-camera footage, a global-motion-compensated
(stabilized) variant for handheld/panning footage, + IoU tracking — no
external model (replacing the reference's yolov3-via-MPT, demo.py:87-100;
the baked-in OpenCV 5 dropped HOGDescriptor, so camera-motion compensation
stands in for an appearance detector). External detections
(--detections npz), OpenPose STAF (--tracking_method pose --staf_dir, runs
the binary if installed), or --detector none (full-frame) are alternatives.
Rendering uses the built-in native rasterizer (no pyrender/EGL).
"""

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np  # noqa: E402

from tepose_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


MIN_NUM_FRAMES = 25


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--vid_file", type=str, default="",
                   help="input video path")
    p.add_argument("--tracking_method", type=str, default="bbox",
                   choices=["bbox", "pose"])
    p.add_argument("--model", type=str,
                   default="data/pretrained_models/tepose_wpw_3dpw_test.npz")
    p.add_argument("--detections", type=str, default="",
                   help="npz of precomputed detections/tracklets")
    p.add_argument("--staf_dir", type=str, default="",
                   help="OpenPose STAF install dir (runs the binary) or a "
                        "folder of precomputed keypoint JSONs")
    p.add_argument("--detector", type=str, default="auto",
                   choices=["auto", "motion", "stabilized", "none"],
                   help="built-in detector when no --detections are given: "
                        "'auto' = probe camera motion and pick; 'motion' = "
                        "background-subtraction proposals (static camera); "
                        "'stabilized' = global-motion-compensated background "
                        "subtraction (handheld/panning footage); 'none' = "
                        "single full-frame tracklet. LIMITATION: the "
                        "motion-based detectors cannot see a fully "
                        "MOTIONLESS person (they are background to median "
                        "subtraction) — for static subjects pass "
                        "--detections from any external detector (the "
                        "reference's yolov3/maskrcnn route), or use "
                        "--detector none for a single centred person")
    p.add_argument("--yolo_img_size", type=int, default=416,
                   help="ignored: the built-in detector replaces yolov3 "
                        "(pass --detections for external detector output)")
    p.add_argument("--tracker_batch_size", type=int, default=12,
                   help="ignored: the built-in IoU tracker is not batched")
    p.add_argument("--display", action="store_true",
                   help="show the rendered frames in a window while writing")
    p.add_argument("--precision", type=str, default="float32",
                   choices=["float32", "bf16"],
                   help="bf16 runs the ResNet-50 feature extractor in "
                        "bfloat16 (1.4x faster, ~0.13%% feature error — "
                        "fine for live demo, not for metric eval)")
    p.add_argument("--serving", nargs="?", const="serving",
                   choices=["serving", "serving-joints"], default=None,
                   help="composed serving preset (bf16 backbone + f16 "
                        "output readbacks; 'serving-joints' additionally "
                        "ships joints only — no meshes, so it excludes "
                        "rendering/--save_obj). One switch for the "
                        "individually-measured serving knobs; see "
                        "streaming.engine.ENGINE_PRESETS")
    p.add_argument("--save_pkl", action="store_true")
    p.add_argument("--save_obj", action="store_true")
    p.add_argument("--run_smplify", action="store_true")
    p.add_argument("--gender", type=str, default="neutral")
    p.add_argument("--wireframe", action="store_true")
    p.add_argument("--sideview", action="store_true")
    p.add_argument("--render_plain", action="store_true")
    p.add_argument("--smooth", action="store_true")
    p.add_argument("--smooth_min_cutoff", type=float, default=0.004)
    p.add_argument("--smooth_beta", type=float, default=0.7)
    p.add_argument("--gpu", type=int, default=0)
    p.add_argument("--output_folder", type=str, default="output/demo")
    p.add_argument("--synthetic", action="store_true",
                   help="smoke-run on a generated video with random weights")
    p.add_argument("--profile", type=str, default="",
                   help="capture a jax.profiler trace into this directory")
    p.add_argument("--live", action="store_true",
                   help="frame-at-a-time causal mode: pose for frame t is "
                        "computed (and rendered) the moment frame t arrives "
                        "— T+1=6 latency instead of whole-clip batching. "
                        "Single person, static camera; --vid_file may be "
                        "cam:<N> for a webcam. Prints per-frame latency")
    p.add_argument("--live_bootstrap", type=int, default=MIN_NUM_FRAMES,
                   help="frames buffered at stream start to build the "
                        "causal detector's background model")
    p.add_argument("--live_max_frames", type=int, default=0,
                   help="stop the live loop after N frames (0 = all; "
                        "useful for webcams)")
    p.add_argument("--live_streams", type=int, default=1,
                   help="live mode person slots: N>1 follows up to N people "
                        "concurrently (stable slots; a slot whose person "
                        "leaves is re-seeded by the next newcomer and its "
                        "stream state reset)")
    return p.parse_args()


def make_synthetic_video(path: str, n_frames: int = 40,
                         size=(240, 320)) -> None:
    import cv2

    h, w = size
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                             (w, h))
    rs = np.random.RandomState(0)
    for t in range(n_frames):
        frame = np.full((h, w, 3), 40, np.uint8)
        cx = int(w / 2 + 40 * np.sin(t / 8))
        cv2.circle(frame, (cx, h // 2), 40, (0, 180, 220), -1)
        frame += rs.randint(0, 10, frame.shape).astype(np.uint8)
        writer.write(frame)
    writer.release()


def build_demo_models(args):
    """Load (or synthesize, with --synthetic) SMPL assets + the three nets.

    Returns (smpl, faces, mcfg, vcfg, tepose_params, vibe_params,
    backbone_params) — shared by the offline and --live paths."""
    import jax

    from tepose_tpu.config import BASE_DATA_DIR
    from tepose_tpu.models.backbone import resnet50_init
    from tepose_tpu.models.smpl import (
        load_smpl_assets, load_smpl_faces, synthetic_smpl_model)
    from tepose_tpu.models.tepose import (
        TePoseConfig, VibeConfig, tepose_init, vibe_init)
    from tepose_tpu.train.checkpoint import load_checkpoint

    mcfg = TePoseConfig(seqlen=6, n_layers=2, hidden_size=1024)
    vcfg = VibeConfig(seqlen=16, n_layers=2, hidden_size=1024,
                      add_linear=True)
    smpl_npz = osp.join(BASE_DATA_DIR, f"smpl_{args.gender}.npz")
    if osp.isfile(smpl_npz):
        smpl = load_smpl_assets(smpl_npz)
        faces = load_smpl_faces(smpl_npz)
    elif args.synthetic:
        smpl = synthetic_smpl_model(seed=0)
        # icosphere-ish random faces are useless; build a coarse convex hull
        from scipy.spatial import ConvexHull

        pts = np.asarray(smpl.v_template)
        faces = ConvexHull(pts).simplices.astype(np.int32)
    else:
        sys.exit(f"{smpl_npz} missing — convert your SMPL model with "
                 "tools/convert_smpl.py (or --synthetic to smoke-run)")

    cpu = jax.local_devices(backend="cpu")[0]
    if args.synthetic or not osp.isfile(args.model):
        if not args.synthetic:
            sys.exit(f"{args.model} is not a pretrained model!")
        with jax.default_device(cpu):
            tepose_params = tepose_init(jax.random.PRNGKey(0), mcfg)
            vibe_params = vibe_init(jax.random.PRNGKey(1), vcfg)
            backbone_params = resnet50_init(jax.random.PRNGKey(2))
    else:
        tepose_params = load_checkpoint(args.model)[0]["gen"]
        spin_npz = osp.join(BASE_DATA_DIR, "spin_model_checkpoint.npz")
        vibe_npz = osp.join(BASE_DATA_DIR, "vibe_wo_3dpw.npz")
        for pth in (spin_npz, vibe_npz):
            if not osp.isfile(pth):
                sys.exit(f"{pth} missing — run tools/convert_checkpoint.py")
        backbone_params = load_checkpoint(spin_npz)[0]["backbone"]
        vibe_params = load_checkpoint(vibe_npz)[0]["gen"]
    return (smpl, faces, mcfg, vcfg, tepose_params, vibe_params,
            backbone_params)


def run_live(args, crop_size: int = 224):
    """Causal frame-at-a-time demo: detect → crop → LiveSession.push →
    render, each step the moment its frame arrives.

    TPU-new capability: the reference's demo batches whole tracklets
    (ref: demo.py:171-252) and can only run offline; this path serves pose
    for frame t with T+1 = 6 frames of algorithmic latency (the paper's
    headline argument, SURVEY §6) plus one device step. Static camera
    (webcams/fixed installs); `--vid_file cam:<N>` reads a webcam;
    `--live_streams N` follows up to N people in stable slots (slot churn
    resets the matching LiveSession stream). Prints per-frame latency
    percentiles at the end.
    """
    import collections

    from tepose_tpu.native import crop_normalize, render_mesh
    from tepose_tpu.streaming import demo_utils as D
    from tepose_tpu.streaming.live import LiveSession
    from tepose_tpu.streaming.tracker import CausalPersonTracker

    os.makedirs(args.output_folder, exist_ok=True)
    if args.synthetic and not args.vid_file:
        args.vid_file = osp.join(args.output_folder, "synthetic_input.mp4")
        make_synthetic_video(args.vid_file)

    cap = None
    if args.vid_file.startswith("cam:"):
        import cv2

        cap = cv2.VideoCapture(int(args.vid_file.split(":", 1)[1]))
        if not cap.isOpened():
            sys.exit(f"cannot open webcam {args.vid_file!r}")
        fps_in = cap.get(cv2.CAP_PROP_FPS) or 30.0

        def frames_iter():
            while True:
                ok, bgr = cap.read()
                if not ok:
                    return
                yield cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    else:
        if not osp.isfile(args.vid_file):
            sys.exit(f"input video {args.vid_file!r} does not exist!")
        fps_in = D.video_fps(args.vid_file)

        def frames_iter():
            return D.read_video_frames(args.vid_file)

    (smpl, faces, mcfg, vcfg, tepose_params, vibe_params,
     backbone_params) = build_demo_models(args)
    K = max(1, int(args.live_streams))
    import jax.numpy as _jnp

    session = LiveSession(
        smpl, tepose_params, vibe_params, mcfg, vcfg, n_streams=K,
        backbone_params=backbone_params,
        outputs=(("theta", "kp_3d")
                 if args.serving == "serving-joints"
                 else ("theta", "verts", "kp_3d")),
        backbone_dtype=_jnp.bfloat16 if args.precision == "bf16" else None,
        preset=args.serving)
    if K > 1:
        from tepose_tpu.streaming.tracker import CausalPeopleTracker

        tracker = CausalPeopleTracker(slots=K,
                                      bootstrap=args.live_bootstrap)
        track_step, track_flush = tracker.update, tracker.flush
    else:
        tracker = CausalPersonTracker(bootstrap=args.live_bootstrap)

        def _as_slots(b):  # (k,4) -> ((k,1,4), present, fresh)
            k = len(b)
            return (b.reshape(k, 1, 4), np.ones((k, 1), bool),
                    np.zeros((k, 1), bool))

        track_step = lambda frame: _as_slots(tracker.update(frame))
        track_flush = lambda: _as_slots(tracker.flush())

    display = args.display
    if display:
        import cv2

        try:
            cv2.namedWindow("TePose live", cv2.WINDOW_NORMAL)
        except cv2.error as e:
            print(f"--display unavailable (headless environment?): {e}")
            display = False

    base = osp.splitext(osp.basename(args.vid_file.replace("cam:", "cam")))[0]
    out_path = osp.join(args.output_folder, f"tepose_{base}_live_result.mp4")

    pending = collections.deque()
    lat_ms = []
    # result rows are only kept when they will be saved — a webcam session
    # must not grow its memory with stream length (verts alone are ~83 KB a
    # frame); the rendered video streams through an incremental writer too.
    rows = ({s: {k: [] for k in ("theta", "verts", "joints3d", "orig_cam",
                                 "bboxes", "valid", "present")}
             for s in range(K)}
            if args.save_pkl else None)
    writer_box = {"w": None}
    stop = {"flag": False}

    def process(img, boxes_s, present_s, fresh_s):
        nonlocal display
        crops = crop_normalize(img, boxes_s, out_size=crop_size,
                               normalize=False)              # (K, 3, S, S)
        t0 = time.perf_counter()
        out = session.push(crops, reset=fresh_s if fresh_s.any() else None)
        lat_ms.append((time.perf_counter() - t0) * 1e3)
        bbox_ch = np.stack([boxes_s[:, 0], boxes_s[:, 1],
                            boxes_s[:, 2] * 1.2], axis=1)    # (K, 3)
        orig_cam = D.convert_crop_cam_to_orig_img(
            out["theta"][:, :3], bbox_ch, img.shape[1], img.shape[0])
        rendered = img.copy()
        for s in range(K):
            if rows is not None:
                r = rows[s]
                r["theta"].append(out["theta"][s])
                if "verts" in out:  # absent under --serving serving-joints
                    r["verts"].append(out["verts"][s])
                r["joints3d"].append(out["kp_3d"][s])
                r["orig_cam"].append(orig_cam[s])
                r["bboxes"].append(bbox_ch[s])
                r["valid"].append(bool(out["valid"][s]))
                r["present"].append(bool(present_s[s]))
            if present_s[s] and "verts" in out:
                rendered = render_mesh(out["verts"][s], faces, orig_cam[s],
                                       rendered)
        if writer_box["w"] is None:
            writer_box["w"] = D.StreamingVideoWriter(
                out_path, rendered.shape[1], rendered.shape[0], fps_in)
        writer_box["w"].write(rendered)
        if display:
            import cv2

            cv2.imshow("TePose live",
                       cv2.cvtColor(rendered, cv2.COLOR_RGB2BGR))
            if cv2.waitKey(1) & 0xFF == ord("q"):
                stop["flag"] = True  # q = end the session, not just the view
                display = False
                cv2.destroyAllWindows()

    n_in = 0
    wall0 = time.time()
    try:
        # Ctrl-C on an endless webcam stream is the normal way out: finalize
        # (video close, pkl, latency report) instead of discarding the run.
        try:
            for frame in frames_iter():
                if stop["flag"] or (args.live_max_frames
                                    and n_in >= args.live_max_frames):
                    break
                n_in += 1
                pending.append(frame)
                bs, ps, fs = track_step(frame)
                for i in range(len(bs)):
                    process(pending.popleft(), bs[i], ps[i], fs[i])
            if not stop["flag"]:
                bs, ps, fs = track_flush()  # stream shorter than bootstrap
                for i in range(len(bs)):
                    process(pending.popleft(), bs[i], ps[i], fs[i])
        except KeyboardInterrupt:
            print("\ninterrupted — finalizing live session")
    finally:
        if cap is not None:
            cap.release()
        if writer_box["w"] is not None:
            writer_box["w"].close()
    wall = time.time() - wall0
    if display:
        import cv2

        cv2.destroyAllWindows()
    n_out = writer_box["w"].n if writer_box["w"] is not None else 0
    if not n_out:
        sys.exit("live mode produced no frames (empty input?)")

    if rows is not None:
        import joblib

        pkl_path = osp.join(args.output_folder,
                            f"tepose_{base}_live_output.pkl")
        joblib.dump({s: {k: np.asarray(v) for k, v in r.items()}
                     for s, r in rows.items()}, pkl_path)
        print(f"Saved results to {pkl_path}")

    lat = np.asarray(lat_ms[1:] or lat_ms)  # drop the compile-bearing step
    print(f"Live frames: {n_out} (bootstrap delay "
          f"{min(args.live_bootstrap, n_in)} frames)")
    print(f"Per-frame latency ms: p50 {np.percentile(lat, 50):.1f} "
          f"p95 {np.percentile(lat, 95):.1f} (first step excl.: compile)")
    print(f"Aggregate FPS incl. decode/detect/render: "
          f"{n_out / max(wall, 1e-9):.2f}")
    print(f"Saved result video to {osp.abspath(out_path)}")
    return {"frames": n_out, "lat_ms_p50":
            float(np.percentile(lat, 50)), "out_path": out_path}


def main():
    args = parse_args()
    if args.serving == "serving-joints":
        # joints-only serving computes no meshes at all
        blocked = [f for f in ("save_obj", "wireframe", "sideview",
                               "display") if getattr(args, f)]
        if blocked:
            sys.exit("--serving serving-joints ships joints only (no "
                     "meshes); drop " + ", ".join("--" + f for f in blocked))
        if not args.save_pkl and not args.live:
            sys.exit("--serving serving-joints skips rendering — pass "
                     "--save_pkl so the run produces an output")

    import jax

    from tepose_tpu.native import crop_normalize, render_mesh
    from tepose_tpu.ops.filters import smooth_pose_params
    from tepose_tpu.streaming import demo_utils as D
    from tepose_tpu.streaming.engine import StreamingEngine
    from tepose_tpu.streaming.tracker import (
        detect_people_simple, load_detections_npz, load_pose_tracklets)

    if args.live:
        return run_live(args)

    total_time_start = time.time()
    from tepose_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    if args.profile:
        jax.profiler.start_trace(args.profile)

    # ---- input video -------------------------------------------------------
    if args.synthetic and not args.vid_file:
        os.makedirs(args.output_folder, exist_ok=True)
        args.vid_file = osp.join(args.output_folder, "synthetic_input.mp4")
        make_synthetic_video(args.vid_file)
    if args.vid_file.startswith(("https://", "http://")):
        # ref: demo.py:64-67 — a YouTube link is downloaded then processed
        print(f"Downloading YouTube video {args.vid_file!r}")
        args.vid_file = D.download_youtube_clip(args.vid_file,
                                                args.output_folder)
        print(f"YouTube video has been downloaded to {args.vid_file}")
    if not osp.isfile(args.vid_file):
        sys.exit(f"input video {args.vid_file!r} does not exist!")

    with timer.stage("decode"):
        frames = list(D.read_video_frames(args.vid_file))
    num_frames = len(frames)
    fps_in = D.video_fps(args.vid_file)
    orig_h, orig_w = frames[0].shape[:2]
    print(f"Input video {args.vid_file}: {num_frames} frames "
          f"{orig_w}x{orig_h} @ {fps_in:.1f} fps")

    # ---- tracking ----------------------------------------------------------
    _track_t0 = time.time()
    if args.detections:
        tracklets = load_detections_npz(args.detections, num_frames)
    elif args.tracking_method == "pose" and args.staf_dir:
        from glob import glob

        if glob(osp.join(args.staf_dir, "*.json")):
            tracklets = load_pose_tracklets(args.staf_dir)
        else:  # a STAF install dir: run the binary (pose_tracker.py:25-48)
            from tepose_tpu.streaming.tracker import run_staf

            json_dir = osp.join(args.output_folder, "staf_json")
            tracklets = run_staf(args.vid_file, json_dir, args.staf_dir)
    elif args.detector in ("auto", "motion", "stabilized"):
        from tepose_tpu.streaming import tracker as TRK

        det = {"auto": TRK.detect_people_auto,
               "motion": TRK.detect_people_motion,
               "stabilized": TRK.detect_people_stabilized}[args.detector]
        tracklets = det(frames)
        print(f"{args.detector} detector found {len(tracklets)} tracklet(s)")
        if not tracklets:
            print("Nothing detected; falling back to a full-frame tracklet")
            tracklets = detect_people_simple(frames[0].shape, num_frames)
    else:
        print("Detector disabled; using a full-frame tracklet "
              "(pass --detections or --detector auto for multi-person)")
        tracklets = detect_people_simple(frames[0].shape, num_frames)
    timer.totals["track"] += time.time() - _track_t0
    timer.counts["track"] += 1
    tracklets = {k: v for k, v in tracklets.items()
                 if len(v["frames"]) >= MIN_NUM_FRAMES}
    print(f"Tracking yielded {len(tracklets)} tracklet(s)")

    # ---- models ------------------------------------------------------------
    (smpl, faces, mcfg, vcfg, tepose_params, vibe_params,
     backbone_params) = build_demo_models(args)

    import jax.numpy as _jnp

    engine = StreamingEngine(
        smpl, tepose_params, vibe_params, backbone_params, mcfg, vcfg,
        backbone_dtype=_jnp.bfloat16 if args.precision == "bf16" else None,
        preset=args.serving)

    # ---- per-tracklet streaming (batched across tracklets) -----------------
    stream_time_start = time.time()
    results = {}
    total_pred_frames = 0
    pids = list(tracklets.keys())
    squares = {}
    crops_list = []
    # short videos ride the fused crops->verts program; long ones would hold
    # every raw crop in RAM, so they stream through feature extraction
    fused = sum(len(tracklets[p]["frames"])
                for p in pids) <= engine.max_frames_per_call
    for pid in pids:
        tr = tracklets[pid]
        bboxes = tr["bbox"].copy()
        # square crops, like the reference's bbox scale handling
        side = np.maximum(bboxes[:, 2], bboxes[:, 3])
        sq = np.stack([bboxes[:, 0], bboxes[:, 1], side, side], axis=1)
        squares[pid] = sq

        crops = []
        for local_i, f_idx in enumerate(tr["frames"]):
            # raw u8 crops: 4x less link traffic; the engine normalises
            # on-device (engine._get_features_fn)
            crops.append(crop_normalize(frames[int(f_idx)],
                                        sq[local_i:local_i + 1],
                                        normalize=False)[0])
        crops = np.stack(crops)
        total_pred_frames += len(crops)
        if fused:
            crops_list.append(crops)
        else:
            # long video: don't hold every tracklet's raw crops in RAM —
            # reduce to 2048-d features immediately (~75x smaller)
            crops_list.append(engine.extract_features_multi([crops])[0])

    if fused:
        # fused crops -> features -> windowed scan, one device call per
        # tracklet-length bucket (features never visit the host)
        outs = engine.run_tracklets_from_crops(crops_list)
    else:
        outs = engine.run_tracklets(crops_list)
    for pid, out in zip(pids, outs):
        tr = tracklets[pid]
        sq = squares[pid]

        pred_theta = out["theta"]
        pred_verts = out.get("verts")  # absent under serving-joints

        if args.run_smplify and "joints2d" in tr:
            # Temporal-SMPLify refinement against the tracked 2D keypoints
            # (working replacement for the reference's broken smplify_runner,
            # demo_utils.py:89-165; requires --tracking_method pose)
            import jax.numpy as jnp

            from tepose_tpu.data.kp_utils import convert_kps
            from tepose_tpu.data.transforms import (
                normalize_2d_kp, transform_keypoints)
            from tepose_tpu.models.smplify import smplify_refine
            from tepose_tpu.ops.geometry import batch_rodrigues

            kp = convert_kps(tr["joints2d"], "staf", "spin")
            kp[..., :2] = normalize_2d_kp(transform_keypoints(
                kp[..., :2],
                np.stack([sq[:, 0], sq[:, 1], sq[:, 2], sq[:, 3]], 1)))
            rotmat = np.asarray(batch_rodrigues(jnp.asarray(
                pred_theta[:, 3:75].reshape(-1, 3)))).reshape(-1, 24, 3, 3)
            refined = smplify_refine(
                smpl, jnp.asarray(rotmat),
                jnp.asarray(pred_theta[:, 75:]),
                jnp.asarray(pred_theta[:, :3]), jnp.asarray(kp))
            pred_theta = np.asarray(refined["theta"])
            pred_verts = np.asarray(refined["verts"])
            out["kp_3d"] = np.asarray(refined["kp_3d"])
            out["kp_2d"] = np.asarray(refined["kp_2d"])
        elif args.run_smplify:
            print("--run_smplify needs 2D keypoints: use "
                  "--tracking_method pose --staf_dir <openpose jsons>")

        if args.smooth:
            from tepose_tpu.models.smpl import smpl_forward
            from tepose_tpu.ops.geometry import batch_rodrigues
            import jax.numpy as jnp

            pose_s, betas_s = smooth_pose_params(
                pred_theta[:, 3:75].astype(np.float64),
                pred_theta[:, 75:].astype(np.float64),
                args.smooth_min_cutoff, args.smooth_beta)
            rot = batch_rodrigues(
                jnp.asarray(pose_s.reshape(-1, 3),
                            jnp.float32)).reshape(-1, 24, 3, 3)
            sm = smpl_forward(smpl, jnp.asarray(betas_s, jnp.float32), rot)
            pred_verts = np.asarray(sm["verts"])
            pred_theta = pred_theta.copy()
            pred_theta[:, 3:75] = pose_s
            pred_theta[:, 75:] = betas_s

        cam = pred_theta[:, :3]
        bbox_ch = np.stack([sq[:, 0], sq[:, 1], sq[:, 2] * 1.2], axis=1)
        orig_cam = D.convert_crop_cam_to_orig_img(
            cam, bbox_ch, orig_w, orig_h)
        results[pid] = {
            "pred_cam": cam,
            "orig_cam": orig_cam,
            "verts": pred_verts,
            "pose": pred_theta[:, 3:75],
            "betas": pred_theta[:, 75:],
            "joints3d": out["kp_3d"],
            "kp_2d": out.get("kp_2d"),
            "bboxes": bbox_ch,
            "frame_ids": tr["frames"],
        }
    stream_time = time.time() - stream_time_start
    stages = ", ".join(f"{k} {v:.1f}s"
                       for k, v in sorted(engine.timings.items()))
    print(f"TePose FPS: {total_pred_frames / max(stream_time, 1e-9):.2f} "
          f"({stages})")
    for k, v in engine.timers.summary().items():
        timer.totals[k] += v["total_s"]
        timer.counts[k] += v["count"]

    os.makedirs(args.output_folder, exist_ok=True)
    base = osp.splitext(osp.basename(args.vid_file))[0]

    if args.save_pkl:
        import joblib

        pkl_path = osp.join(args.output_folder, f"tepose_{base}_output.pkl")
        joblib.dump(results, pkl_path)
        print(f"Saved results to {pkl_path}")

    if args.serving == "serving-joints":
        # joints-only serving computes no meshes: nothing to render
        print("serving-joints: skipped rendering (no verts in outputs)")
        total = time.time() - total_time_start
        print(f"Total FPS (including model loading): "
              f"{num_frames / total:.2f}")
        print(f"Stage timing: {timer.report()}")
        if args.profile:
            jax.profiler.stop_trace()
            print(f"Saved device trace to {args.profile}")
        return

    # ---- rendering ---------------------------------------------------------
    frame_results = D.prepare_rendering_results(results, num_frames)
    display = args.display
    if display:  # ref: demo.py:426-431 (cv2 window per rendered frame)
        import cv2

        try:
            cv2.namedWindow("TePose", cv2.WINDOW_NORMAL)
        except cv2.error as e:
            print(f"--display unavailable (headless environment?): {e}")
            display = False
    out_frames = []
    _render_t0 = time.time()
    for f_idx in range(num_frames):
        img = (np.zeros_like(frames[f_idx]) if args.render_plain
               else frames[f_idx].copy())
        # side view: ONE canvas per frame, all persons rendered into it,
        # concatenated once AFTER the person loop (ref: demo.py:409-420) —
        # concatenating per person would widen multi-person frames
        # per person and leave person-free frames at the original width,
        # and cv2.VideoWriter silently drops frames whose size differs
        side_img = np.zeros_like(img) if args.sideview else None
        rot90 = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], np.float32)
        for pid, pd in frame_results[f_idx].items():
            if args.wireframe:
                from tepose_tpu.utils.vis import draw_wireframe

                img = draw_wireframe(img, pd["verts"], pd["cam"], faces)
            else:
                img = render_mesh(pd["verts"], faces, pd["cam"], img)
            if args.sideview:
                side_verts = pd["verts"] @ rot90.T
                side_img = render_mesh(side_verts, faces, pd["cam"],
                                       side_img)
        if args.sideview:
            img = np.concatenate([img, side_img], axis=1)
        out_frames.append(img)
        if display:
            import cv2

            cv2.imshow("TePose", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            if cv2.waitKey(1) & 0xFF == ord("q"):
                display = False
                cv2.destroyAllWindows()

    if args.save_obj:
        obj_dir = osp.join(args.output_folder, f"{base}_obj")
        os.makedirs(obj_dir, exist_ok=True)
        for pid, pd in results.items():
            # every frame, as the reference does (ref: demo.py:395-398)
            for i, f_idx in enumerate(pd["frame_ids"]):
                path = osp.join(obj_dir, f"p{pid}_f{int(f_idx):06d}.obj")
                with open(path, "w") as f:
                    for v in pd["verts"][i]:
                        f.write(f"v {v[0]} {v[1]} {v[2]}\n")
                    for tri in faces + 1:
                        f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")

    timer.totals["render"] += time.time() - _render_t0
    timer.counts["render"] += 1
    if display:
        import cv2

        cv2.destroyAllWindows()

    out_path = osp.join(args.output_folder, f"tepose_{base}_result.mp4")
    with timer.stage("write_video"):
        D.write_video(out_frames, out_path, fps_in)
    print(f"Saved result video to {osp.abspath(out_path)}")
    total = time.time() - total_time_start
    print(f"Total FPS (including model loading): "
          f"{num_frames / total:.2f}")
    print(f"Stage timing: {timer.report()}")
    if args.profile:
        jax.profiler.stop_trace()
        print(f"Saved device trace to {args.profile}")


if __name__ == "__main__":
    main()

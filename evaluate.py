#!/usr/bin/env python
"""Benchmark evaluation CLI — reference-compatible surface.

ref: evaluate.py (the reference's hand-rolled eval loop, :209-462). Usage:

  python evaluate.py --dataset 3dpw --cfg configs/repr_wopw_3dpw_model.yaml
  python evaluate.py --dataset mpii3d --cfg ... [--seq S] [--filter] [--plot]
  python evaluate.py --synthetic            # smoke-run on generated data

Differences from the reference, by design (TPU-first):
  * videos are evaluated as padded batches through one jitted
    lax.scan program (eval.evaluator) instead of a per-video Python loop;
  * checkpoints are converted `.npz` files (tools/convert_checkpoint.py);
  * --render / --render_plain use the built-in native rasterizer (no
    pyrender/EGL); frames whose source images are missing on disk render on
    a plain background;
  * matmuls default to the tensorfloat32 tier (3-pass): measured 70x inside
    the 0.1 mm parity bar at 1.77x strict-f32 throughput — see
    `precision_scope` and tools/precision_sweep.json; `--precision float32`
    forces full-precision passes for exact-parity runs.
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



def build_models(cfg, synthetic: bool):
    import jax

    from tepose_tpu.config import BASE_DATA_DIR
    from tepose_tpu.models.smpl import load_smpl_assets, synthetic_smpl_model
    from tepose_tpu.models.tepose import (
        TePoseConfig, VibeConfig, tepose_init, vibe_init)
    from tepose_tpu.train.checkpoint import load_checkpoint

    mcfg = TePoseConfig(seqlen=cfg.DATASET.SEQLEN,
                        n_layers=cfg.MODEL.TGRU.NUM_LAYERS,
                        hidden_size=cfg.MODEL.TGRU.HIDDEN_SIZE)
    # the bootstrap VIBE (ref: evaluate.py:89-98)
    vcfg = VibeConfig(seqlen=16, n_layers=2, hidden_size=1024,
                      add_linear=True)

    smpl_npz = osp.join(BASE_DATA_DIR, "smpl_neutral.npz")
    if osp.isfile(smpl_npz):
        smpl = load_smpl_assets(smpl_npz)
    elif synthetic:
        smpl = synthetic_smpl_model(seed=0)
    else:
        raise FileNotFoundError(
            f"{smpl_npz} not found — convert your licensed SMPL pkl with "
            "tools/convert_smpl.py (or pass --synthetic for a smoke run)")

    cpu = jax.local_devices(backend="cpu")[0]
    if synthetic:
        with jax.default_device(cpu):
            gen = tepose_init(jax.random.PRNGKey(0), mcfg)
            vibe = vibe_init(jax.random.PRNGKey(1), vcfg)
    else:
        if not osp.isfile(cfg.TRAIN.PRETRAINED):
            print(f"{cfg.TRAIN.PRETRAINED} is not a pretrained model! "
                  "Exiting...")
            sys.exit(1)
        trees, scalars = load_checkpoint(cfg.TRAIN.PRETRAINED)
        gen = trees["gen"]
        if "performance" in scalars:
            print(f"Loaded checkpoint, performance "
                  f"{scalars['performance']:.2f}")
        vibe_npz = osp.join(BASE_DATA_DIR, "vibe_wo_3dpw.npz")
        if not osp.isfile(vibe_npz):
            raise FileNotFoundError(
                f"{vibe_npz} not found — convert the released VIBE "
                "checkpoint with tools/convert_checkpoint.py --kind vibe")
        vibe = load_checkpoint(vibe_npz)[0]["gen"]

    jreg_path = osp.join(BASE_DATA_DIR, "J_regressor_h36m.npy")
    if osp.isfile(jreg_path):
        j_regressor = np.load(jreg_path).astype(np.float32)
    else:
        if not synthetic:
            raise FileNotFoundError(f"{jreg_path} missing")
        rs = np.random.RandomState(7)
        j_regressor = (rs.rand(17, smpl.num_verts) ** 8).astype(np.float32)
        j_regressor /= j_regressor.sum(1, keepdims=True)

    return smpl, mcfg, vcfg, gen, vibe, j_regressor


def synthetic_eval_data(num_videos=3, min_len=40, max_len=90, seed=0):
    rs = np.random.RandomState(seed)
    data = {}
    for i in range(num_videos):
        n = int(rs.randint(min_len, max_len))
        # valid_i: per-frame validity the mpii3d eval branch consumes
        # (ref: evaluate.py:397); a hole in the middle exercises the mask
        valid = np.ones((n, 1), np.int64)
        valid[n // 2:n // 2 + 3] = 0
        data[f"synthetic_vid_{i}"] = {
            "features": rs.randn(n, 2048).astype(np.float32) * 0.1,
            "joints3D": rs.randn(n, 49, 3).astype(np.float32) * 0.2,
            "theta_pseu": np.concatenate(
                [np.tile([1.0, 0, 0], (n, 1)),
                 rs.randn(n, 82) * 0.1], axis=1).astype(np.float32),
            "pose": (rs.randn(n, 72) * 0.2).astype(np.float32),
            "shape": (rs.randn(n, 10) * 0.2).astype(np.float32),
            "valid_i": valid,
        }
    return data


def run_eval(cfg, args, synthetic: bool = False, devices: int = 1):
    import jax
    import jax.numpy as jnp

    from tepose_tpu.data.db import (
        eval_db_paths, key_eval_db_by_video, load_db, load_pseudotheta)
    from tepose_tpu.data.kp_utils import convert_kps
    from tepose_tpu.eval.evaluator import (
        EvalAccumulator, make_eval_scan, spin49_to_eval_format)
    from tepose_tpu.models.smpl import smpl_forward
    from tepose_tpu.ops.geometry import batch_rodrigues
    from tepose_tpu.ops.quaternion import smooth_rotmats_slerp

    dataset = args.dataset
    if args.filter and dataset == "mpii3d":
        sys.exit("--filter is not supported for mpii3d: the slerp-smoothed "
                 "rebuild regresses J14 joints through the H36M J_regressor "
                 "(ref: evaluate.py:288-290), which mpii3d eval does not use")
    smpl, mcfg, vcfg, gen, vibe, j_regressor = build_models(cfg, synthetic)
    S = mcfg.seqlen
    use_jreg = dataset != "mpii3d"

    if synthetic:
        data = synthetic_eval_data()
    else:
        db_file, pse_file = eval_db_paths(dataset, cfg.TITLE, args.render)
        print(f"Load data from {db_file}")
        db = load_db(db_file)
        pse = load_pseudotheta(pse_file)
        data = key_eval_db_by_video(db, pse, target_action=args.seq,
                                    is_mpii3d=(dataset == "mpii3d"))

    # ---- bucket videos by padded length to bound compile count ------------
    names = [n for n in data if len(data[n]["features"]) >= S]
    lengths = {n: len(data[n]["features"]) for n in names}
    # Defaults from tools/tune_eval_batching.py runs on the real v5e —
    # per-config numbers live in the committed artifact
    # tools/eval_batching_sweep.json (--out writes/merges it). Caveat
    # recorded there: the dev tunnel's bandwidth varies several-fold
    # between runs and each eval call ships B x T_pad x 2048 f32 features,
    # so the (MAX_B, bucket) ordering moves with link health; on a real
    # host (PCIe) the per-call transfer is negligible and the tradeoff is
    # compile count vs padding waste. Override per run with
    # --eval_batch/--eval_bucket.
    long_videos = dataset != "3dpw"
    bsz = getattr(args, "eval_bucket", None) or (256 if long_videos else 128)
    bucket = lambda n: -(-lengths[n] // bsz) * bsz
    buckets = {}
    for n in names:
        buckets.setdefault(bucket(n), []).append(n)

    from tepose_tpu.eval.evaluator import make_packed_eval_scan
    from tepose_tpu.utils.packing import FlatPacker, pack_smpl

    acc = EvalAccumulator(dataset=dataset)
    eval_fns = {}
    tot_frames = 0
    t_start = time.time()

    mesh = None
    if devices > 1:
        from tepose_tpu.eval.evaluator import make_sharded_eval_scan
        from tepose_tpu.parallel.mesh import make_mesh, replicate

        if len(jax.devices()) < devices:
            sys.exit(f"--devices {devices} requested but only "
                     f"{len(jax.devices())} JAX devices are visible")
        mesh = make_mesh(devices)
        print(f"=> data-parallel eval over {devices} devices: "
              f"{[str(d) for d in mesh.devices.flat]}")
        # replicated weight pytrees (packed single-buffer IO is an
        # axon-tunnel optimisation, unnecessary on a real pod — see
        # parallel/dp.py for the same choice in training)
        gen_r = replicate(gen, mesh)
        vibe_r = replicate(vibe, mesh)
        jreg_r = replicate(jnp.asarray(j_regressor), mesh)

    if mesh is None:
        # pack the fixed weights once (see utils.packing for why)
        weights_template = (gen, vibe, pack_smpl(smpl), j_regressor)
        weights_packer = FlatPacker(weights_template)
        weight_flats = tuple(jnp.asarray(f)
                             for f in weights_packer.pack_np(weights_template))

    # partial chunks pad to the next power of two so program count stays
    # O(log B) per bucket (see the batching note above for the defaults)
    MAX_B = getattr(args, "eval_batch", None) or (8 if long_videos else 32)
    for T_pad, vids in sorted(buckets.items()):
        W = T_pad - S + 1
        for i in range(0, len(vids), MAX_B):
            chunk = vids[i:i + MAX_B]
            B = 1 << max(len(chunk) - 1, 0).bit_length()
            if mesh is not None:
                # mesh mode: round up to a multiple of the device count so
                # the batch axis splits evenly (pad rows are independent)
                B = max(B, -(-B // devices) * devices)
            feats = np.zeros((B, T_pad, 2048), np.float32)
            pseu = np.zeros((B, S - 1, 85), np.float32)
            theta_gt = np.zeros((B, T_pad, 85), np.float32)
            for b, n in enumerate(chunk):
                d = data[n]
                L = lengths[n]
                feats[b, :L] = d["features"]
                pseu[b] = d["theta_pseu"][:S - 1]
                theta_gt[b, :L, :3] = [1.0, 0.0, 0.0]
                theta_gt[b, :L, 3:75] = d["pose"][:L]
                theta_gt[b, :L, 75:] = d["shape"][:L]
            data_batch = {"feats": feats, "theta_pseu": pseu,
                          "theta_gt": theta_gt}
            key = (W, B)
            if mesh is not None:
                if key not in eval_fns:
                    eval_fns[key] = make_sharded_eval_scan(
                        smpl, mcfg, vcfg, W, use_jreg, mesh)
                fn, _, place_data = eval_fns[key]
                sharded = place_data(data_batch)
                pj, pt, mp = fn(gen_r, vibe_r, sharded["feats"],
                                sharded["theta_pseu"],
                                sharded["theta_gt"], jreg_r)
            else:
                if key not in eval_fns:
                    dp = FlatPacker(data_batch)
                    eval_fns[key] = (make_packed_eval_scan(
                        smpl, mcfg, vcfg, W, use_jreg, weights_packer, dp),
                        dp)
                fn, dp = eval_fns[key]
                data_flats = tuple(jnp.asarray(f)
                                   for f in dp.pack_np(data_batch))
                pj, pt, mp = fn(weight_flats, data_flats)
            pred_j3d = np.asarray(pj)
            pred_theta = np.asarray(pt)
            mpvpe = np.asarray(mp)

            for b, n in enumerate(chunk):
                d = data[n]
                L = lengths[n]
                pj = pred_j3d[b, :L]
                if args.filter:
                    # slerp-smooth the rotations, rebuild SMPL + J14
                    # (ref: evaluate.py:273-291)
                    rm = np.asarray(batch_rodrigues(jnp.asarray(
                        pred_theta[b, :L, 3:75].reshape(-1, 3)))).reshape(
                            L, 24, 3, 3)
                    rm = smooth_rotmats_slerp(rm, ratio=0.3)
                    sm = smpl_forward(smpl,
                                      jnp.asarray(pred_theta[b, :L, 75:]),
                                      jnp.asarray(rm))
                    verts = sm["verts"]
                    from tepose_tpu.models.smpl import (
                        H36M_TO_J14, regress_h36m_joints)
                    pj = np.asarray(regress_h36m_joints(
                        verts, jnp.asarray(j_regressor),
                        subset=np.array(H36M_TO_J14)))

                tgt = d["joints3D"][:L].astype(np.float32)
                valid_map = None
                if dataset == "mpii3d":
                    pj = spin49_to_eval_format(pj, "mpii3d")
                    tgt = convert_kps(tgt, "spin", "mpii3d_test")
                    vm = d["valid_i"][:L, 0].nonzero()[0]
                    if vm.size == 0:
                        print(f"No valid frames in {n}. Continue")
                        continue
                    valid_map = vm[vm < L]
                elif tgt.shape[1] == 49:
                    tgt = convert_kps(tgt, "spin", "common")

                if args.plot:
                    from tepose_tpu.eval.metrics import plot_accel

                    out_dir = f"./output/{dataset}_test_output"
                    plot_accel(pj, tgt, out_dir, name=args.seq or n)

                if args.render or args.render_plain:
                    # rebuild verts for this video and overlay
                    # (ref: evaluate.py:304-390)
                    _render_eval_video(
                        dataset, n, d, pred_theta[b, :L], smpl, args,
                        frame_start=args.frame)

                acc.add_video(
                    pj, tgt,
                    mpvpe=mpvpe[b, :L] if dataset == "3dpw" else None,
                    valid_map=valid_map)
                tot_frames += L

    res = acc.summarize()
    dt = time.time() - t_start
    print(f"\nEvaluated total {tot_frames} poses in {dt:.1f}s "
          f"({tot_frames / max(dt, 1e-9):.1f} FPS)")
    print({k: round(v, 4) for k, v in res.items()})
    return res


def _render_eval_video(dataset, seq_name, d, pred_theta, smpl, args,
                       frame_start=0, num_frames_to_render=240):
    """Mesh-overlay rendering of an eval sequence with the native rasterizer
    (ref: evaluate.py:304-390)."""
    import cv2
    import jax.numpy as jnp

    from tepose_tpu.models.smpl import smpl_forward, load_smpl_faces
    from tepose_tpu.native import render_mesh
    from tepose_tpu.ops.geometry import batch_rodrigues
    from tepose_tpu.streaming.demo_utils import (
        convert_crop_cam_to_orig_img, write_video)
    from tepose_tpu.config import BASE_DATA_DIR

    faces_path = osp.join(BASE_DATA_DIR, "smpl_neutral.npz")
    if osp.isfile(faces_path):
        faces = load_smpl_faces(faces_path)
    else:
        from scipy.spatial import ConvexHull

        faces = ConvexHull(np.asarray(smpl.v_template)).simplices.astype(
            np.int32)

    L = len(pred_theta)
    rm = np.asarray(batch_rodrigues(jnp.asarray(
        pred_theta[:, 3:75].reshape(-1, 3)))).reshape(L, 24, 3, 3)
    verts = np.asarray(smpl_forward(
        smpl, jnp.asarray(pred_theta[:, 75:]), jnp.asarray(rm))["verts"])
    cams = pred_theta[:, :3]

    imgnames = d.get("imgname")
    bboxes = d.get("bbox")
    out_dir = f"./output/{dataset}_test_output"
    frames = []
    W_img = H_img = 480
    for i in range(min(L, num_frames_to_render)):
        fi = frame_start + i
        img = None
        if imgnames is not None and not args.render_plain:
            path = str(imgnames[min(fi, len(imgnames) - 1)])
            if osp.isfile(path):
                img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        if img is None:
            img = np.zeros((H_img, W_img, 3), np.uint8)
        h, w = img.shape[:2]
        if bboxes is not None and not args.render_plain:
            bb = bboxes[min(fi, len(bboxes) - 1)].copy()[None, :]
            bb[:, 2:] = bb[:, 2:] * 1.2
            cam4 = convert_crop_cam_to_orig_img(cams[i:i + 1], bb, w, h)[0]
        else:
            cam4 = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
        frames.append(render_mesh(verts[i], faces, cam4, img,
                                  color=(1.0, 1.0, 0.9)))
    tag = "_plain" if args.render_plain else ""
    safe = str(seq_name).split("/")[-1]
    out_path = osp.join(out_dir, "video",
                        f"tepose_{safe}{tag}_{frame_start}.mp4")
    write_video(frames, out_path, fps=25.0)
    print(f"Saving result video to {osp.abspath(out_path)}")


def precision_scope(name: str):
    """Matmul-precision tier for eval, evidence in tools/precision_sweep.json
    (measured on v5e vs an f64 oracle over 61-window AND full-VIDLEN
    520-frame/515-window feedback rollouts — the reference's video cap,
    ref: dataset_3d.py:54, where feedback compounding is worst):

      * tensorfloat32 (default) — 3-pass bf16 matmuls: max joint deviation
        0.0005 mm / MPVPE 0.016 mm at FULL video length, >100x inside the
        0.1 mm north-star bar (BASELINE.md), at 1.76x the strict-f32
        throughput.
      * float32 / highest — 6-pass full-precision: exact-parity runs
        (deviation ~1e-5 mm).
      * bfloat16 / default / fast — single-pass MXU mode: FAILS the bar
        (0.15 mm joints / 1.5 mm MPVPE after feedback compounding); it is
        the demo/serving mode, not an eval mode.
    """
    import contextlib

    import jax

    if name in ("float32", "highest"):
        return jax.default_matmul_precision("float32")
    if name in ("tensorfloat32", "tf32", "high"):
        return jax.default_matmul_precision("tensorfloat32")
    if name in ("bfloat16", "bf16", "default", "fast"):
        # "bf16" matches the spelling train.py/demo.py use for the tier
        return contextlib.nullcontext()
    raise SystemExit(
        f"unknown --precision {name!r}: choose tensorfloat32 (default), "
        "float32, or bfloat16")


def main():
    import jax

    from tepose_tpu.config import parse_args

    synthetic = "--synthetic" in sys.argv
    if synthetic:
        sys.argv.remove("--synthetic")
    def take_value(flag):
        i = sys.argv.index(flag)
        if i + 1 >= len(sys.argv):
            sys.exit(f"{flag} needs a value")
        v = sys.argv[i + 1]
        del sys.argv[i:i + 2]
        return v

    precision = "tensorfloat32"
    if "--precision" in sys.argv:
        precision = take_value("--precision")
    devices = 1
    if "--devices" in sys.argv:
        devices = take_value("--devices")
        try:
            devices = (len(jax.devices()) if devices == "auto"
                       else int(devices))
        except ValueError:
            sys.exit(f"--devices expects an integer or 'auto', "
                     f"got {devices!r}")
    cfg, cfg_file, args = parse_args()
    with precision_scope(precision):
        return run_eval(cfg, args, synthetic=synthetic, devices=devices)


if __name__ == "__main__":
    main()

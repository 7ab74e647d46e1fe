#!/usr/bin/env python
"""Measure evaluate.py's batching knobs (MAX_B x length-bucket) on the real
chip over a realistic video-length distribution.

evaluate.py pads each video to a length bucket and batches up to MAX_B
videos per jitted eval-scan call; bigger batches fill the MXU better, bigger
buckets waste padded windows but compile fewer programs. This sweep runs the
actual packed eval scan over synthetic videos whose lengths mimic the eval
sets (3DPW: ~60 videos, 16..1300 frames; H36M val: longer, more videos) and
reports useful-frames/sec per (MAX_B, bucket).

  python tools/tune_eval_batching.py [--dataset 3dpw|h36m] [--scale 1.0]

Results feed the defaults in evaluate.py (--eval_batch / --eval_bucket).
"""

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np  # noqa: E402

from tepose_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def video_lengths(dataset: str, scale: float, seed: int = 0) -> np.ndarray:
    """Length distributions shaped like the real eval sets (SURVEY.md §3:
    3DPW test = 60 videos of ~16..1300 frames; H36M val ~ hundreds of
    videos, thousands of frames — scaled down by `scale` for sweep time)."""
    rs = np.random.RandomState(seed)
    if dataset == "h36m":
        n = int(120 * scale)
        lens = rs.lognormal(mean=7.3, sigma=0.5, size=n)  # ~1500 median
    else:
        n = int(60 * scale)
        lens = rs.lognormal(mean=6.2, sigma=0.7, size=n)  # ~500 median
    return np.clip(lens, 16, 5000).astype(int)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="3dpw", choices=["3dpw", "h36m"])
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 32, 64])
    ap.add_argument("--bucket_sizes", type=int, nargs="+",
                    default=[128, 256])
    ap.add_argument("--out", default="",
                    help="merge results for this dataset into a committed "
                         "JSON artifact (e.g. tools/eval_batching_sweep"
                         ".json) so evaluate.py's defaults cite a file, "
                         "not a comment")
    args = ap.parse_args()

    from tepose_tpu.eval.evaluator import make_packed_eval_scan
    from tepose_tpu.models.smpl import synthetic_smpl_model
    from tepose_tpu.models.tepose import (
        TePoseConfig, VibeConfig, tepose_init, vibe_init)
    from tepose_tpu.utils.packing import FlatPacker, pack_smpl

    S = 6
    mcfg = TePoseConfig(seqlen=S, n_layers=2, hidden_size=1024)
    vcfg = VibeConfig(seqlen=16, n_layers=2, hidden_size=1024,
                      add_linear=True)
    smpl = synthetic_smpl_model(seed=0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        gen = tepose_init(jax.random.PRNGKey(0), mcfg)
        vibe = vibe_init(jax.random.PRNGKey(1), vcfg)
    jreg = np.random.RandomState(2).rand(17, smpl.num_verts).astype(
        np.float32)
    jreg /= jreg.sum(1, keepdims=True)

    weights_template = (gen, vibe, pack_smpl(smpl), jnp.asarray(jreg))
    wpacker = FlatPacker(weights_template)
    wflats = tuple(jnp.asarray(f) for f in wpacker.pack_np(weights_template))

    lengths = video_lengths(args.dataset, args.scale)
    total_useful = int(lengths.sum())
    print(f"{args.dataset}: {len(lengths)} videos, {total_useful} frames, "
          f"median {int(np.median(lengths))}", flush=True)

    results = {}
    for bucket_size in args.bucket_sizes:
        for max_b in args.batches:
            buckets = {}
            for L in lengths:
                T_pad = -(-max(int(L), S) // bucket_size) * bucket_size
                buckets.setdefault(T_pad, []).append(int(L))

            fns = {}
            t0 = time.time()
            compile_s = 0.0
            for T_pad, vids in sorted(buckets.items()):
                W = T_pad - S + 1
                for i in range(0, len(vids), max_b):
                    chunk = vids[i:i + max_b]
                    B = len(chunk)
                    key = (T_pad, B)
                    data = {
                        "feats": np.random.randn(
                            B, T_pad, 2048).astype(np.float32) * 0.1,
                        "theta_pseu": np.zeros((B, S - 1, 85), np.float32),
                        "theta_gt": np.zeros((B, T_pad, 85), np.float32),
                    }
                    dpacker = FlatPacker(data)
                    if key not in fns:
                        tc = time.time()
                        fns[key] = make_packed_eval_scan(
                            smpl, mcfg, vcfg, W, True, wpacker, dpacker)
                        # compile via a first call
                        out = fns[key](wflats, tuple(
                            jnp.asarray(f) for f in dpacker.pack_np(data)))
                        np.asarray(out[0][:1, :1])
                        compile_s += time.time() - tc
                        t0 += time.time() - tc  # exclude compiles from rate
                    out = fns[key](wflats, tuple(
                        jnp.asarray(f) for f in dpacker.pack_np(data)))
                    np.asarray(out[0][:1, :1])  # sync
            dt = time.time() - t0
            fps = total_useful / dt
            results[f"B{max_b}_bucket{bucket_size}"] = {
                "useful_fps": round(fps, 1),
                "steady_s": round(dt, 2),
                "compile_s": round(compile_s, 1),
                "programs": len(fns),
            }
            print(f"MAX_B={max_b:3d} bucket={bucket_size:4d}: "
                  f"{fps:9.1f} useful frames/s "
                  f"(steady {dt:6.2f}s, compile {compile_s:5.1f}s, "
                  f"{len(fns)} programs)", flush=True)

    print(json.dumps({"dataset": args.dataset, "results": results}))
    if args.out:
        merged = {}
        if osp.isfile(args.out):
            with open(args.out) as f:
                merged = json.load(f)
        device = jax.devices()[0].device_kind
        merged[args.dataset] = {"device": device, "results": results}
        with open(args.out, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

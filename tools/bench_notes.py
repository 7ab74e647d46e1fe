#!/usr/bin/env python
"""Measurements behind BENCH_NOTES.md, on the real chip.

Breaks the fused streaming program into its stages and measures each as its
own device program at identical shapes (the tunnel makes per-op trace
summaries impractical — program-level attribution is the reliable
decomposition), plus the GAN train segment at batch 32 vs 64 (the
throughput-scaling knob VERDICT r2 asked to be measured, not guessed).

  python tools/bench_notes.py [--profile <dir>]

Prints one JSON object; paste the numbers into BENCH_NOTES.md.
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


_RAMPED = {"done": False}


def _sync_time(fn, *args, reps=6):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x[..., :1]), out)  # warmup
    if not _RAMPED["done"]:
        # the first timed loop of a fresh process runs ~2.8x slow regardless
        # of program (device/link ramp — see bench.py `_time_stream` and
        # BENCH_NOTES.md decision 8); burn it so the FIRST stage measured
        # isn't inflated relative to later ones.
        for _ in range(4):
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
        _RAMPED["done"] = True
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[..., :1])  # one sync for the async chain
    return (time.time() - t0) / reps


def stage_breakdown(n_streams=8, frames=120):
    """Device seconds of each stage of the e2e path at bench.py shapes."""
    from tepose_tpu.models.backbone import (normalize_crop, resnet50_features,
                                             resnet50_init)
    from tepose_tpu.models.smpl import synthetic_smpl_model
    from tepose_tpu.models.tepose import TePoseConfig, tepose_init
    from tepose_tpu.streaming.fast_scan import fast_stream_scan
    from tepose_tpu.utils.packing import FlatPacker, pack_smpl, unpack_smpl

    cfg = TePoseConfig(seqlen=6, n_layers=2, hidden_size=1024)
    smpl = synthetic_smpl_model(seed=0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        gen = tepose_init(jax.random.PRNGKey(0), cfg)
        bb = resnet50_init(jax.random.PRNGKey(2))
    gpack = FlatPacker((gen, pack_smpl(smpl)))
    gflats = jax.device_put(gpack.pack((gen, pack_smpl(smpl))))
    bpack = FlatPacker(bb)
    bflats = jax.device_put(bpack.pack(bb))

    rng = np.random.RandomState(1)
    crops = jax.device_put(jnp.asarray(rng.randint(
        0, 255, (n_streams * frames, 3, 224, 224), np.uint8)))
    feats = jax.device_put(jnp.asarray(
        rng.randn(n_streams, frames, 2048).astype(np.float32) * 0.1))
    pseu = jnp.zeros((n_streams, cfg.seqlen - 1, 85))
    W = frames - cfg.seqlen + 1

    cb = 16  # the engine's measured chunk-size optimum (backbone_chunk_sweep)

    @jax.jit
    def backbone_only(bflats, crops):
        params = bpack.unpack(bflats)

        def chunk(c):
            return resnet50_features(params, normalize_crop(c))

        return jax.lax.map(
            chunk, crops.reshape(-1, cb, 3, 224, 224))

    @jax.jit
    def scan_full(gflats, feats, pseu):
        gen, smpl_t = gpack.unpack(gflats)
        model = unpack_smpl(smpl, smpl_t)
        return fast_stream_scan(gen, model, feats, pseu, cfg, W,
                                outputs=("theta", "verts", "kp_3d",
                                         "kp_2d"))["theta"]

    @jax.jit
    def scan_theta(gflats, feats, pseu):
        gen, smpl_t = gpack.unpack(gflats)
        model = unpack_smpl(smpl, smpl_t)
        return fast_stream_scan(gen, model, feats, pseu, cfg, W,
                                outputs=("theta",))["theta"]

    return {
        "backbone_960_crops_s": round(
            _sync_time(backbone_only, bflats, crops), 4),
        "scan_full_outputs_s": round(
            _sync_time(scan_full, gflats, feats, pseu), 4),
        "scan_theta_only_s": round(
            _sync_time(scan_theta, gflats, feats, pseu), 4),
    }


def backbone_chunk_sweep(chunks=(8, 16, 32, 120, 480), n_crops=960):
    """Crops/sec of the chunked ResNet-50 vs lax.map chunk size, interleaved
    trials (drift-proof). Source of the engine's crop_batch=16 default:
    small chunks keep early-stage conv activations VMEM-resident between
    fused layers; below ~16 the MXU starves on tiny batches."""
    from tepose_tpu.models.backbone import (normalize_crop, resnet50_features,
                                             resnet50_init)
    from tepose_tpu.utils.packing import FlatPacker

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        bb = resnet50_init(jax.random.PRNGKey(2))
    pack = FlatPacker(bb)
    flats = jax.device_put(pack.pack(bb))
    rng = np.random.RandomState(1)
    crops = jax.device_put(jnp.asarray(
        rng.randint(0, 255, (n_crops, 3, 224, 224), np.uint8)))
    def make(chunk):
        n = n_crops // chunk

        @jax.jit
        def run(flats, crops):
            params = pack.unpack(flats)

            def f(c):
                return resnet50_features(params, normalize_crop(c))

            return jax.lax.map(
                f, crops.reshape((n, chunk, 3, 224, 224)))

        return run

    fns = {c: make(c) for c in chunks if n_crops % c == 0}
    for fn in fns.values():
        np.asarray(fn(flats, crops)[..., :1])  # compile
    best = {c: float("inf") for c in fns}
    for _ in range(3):
        for c, fn in fns.items():
            t0 = time.time()
            for _ in range(4):
                out = fn(flats, crops)
            np.asarray(out[..., :1])
            best[c] = min(best[c], (time.time() - t0) / 4)
    return {f"chunk{c}": round(n_crops / t, 1) for c, t in best.items()}


def train_batch_scaling():
    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    from bench import measure_training
    from tepose_tpu.train.trainer import TrainHyper

    b32 = measure_training(num_iters=60)
    b64 = measure_training(num_iters=60,
                           hp=TrainHyper(n_2d=38, n_3d=26))
    b64_bf16 = measure_training(
        num_iters=60,
        hp=TrainHyper(n_2d=38, n_3d=26, compute_dtype="bfloat16"))
    b128 = measure_training(num_iters=60,
                            hp=TrainHyper(n_2d=76, n_3d=52))
    # the configs/fast_train.yaml composition: batch 128 AND bf16 together
    fast = measure_training(
        num_iters=60,
        hp=TrainHyper(n_2d=76, n_3d=52, compute_dtype="bfloat16"))
    rnd = lambda v: round(v, 4) if v is not None else None  # noqa: E731

    def _fmt(d):
        return {k: (v if isinstance(v, list) else rnd(v))
                for k, v in d.items()}

    return {
        "batch32": _fmt(b32),
        "batch64": _fmt(b64),
        "batch64_bf16": _fmt(b64_bf16),
        "batch128": _fmt(b128),
        "fast_train_b128_bf16": _fmt(fast),
        "note": "windows/s counts ITERATIONS; batch 64/128 do 2x/4x the "
                "windows per iteration, so samples/s scaling = "
                "(batch/32) * wps / wps32; fast_train_b128_bf16 is the "
                "configs/fast_train.yaml composition",
    }


def train_batch_knee(vidlen=30, num_iters=60):
    """Extend the batch curve to its knee (VERDICT r4 weak #1): batch 256
    and 512 beyond the shipped fast tier's 128, bf16 (the fast-tier
    compute dtype) plus a 256-f32 reference point. Synthetic data;
    vidlen 30 instead of the flagship 126 — per-iteration compute depends
    on (batch, seqlen), not vidlen (windows are sampled per iteration),
    and the flagship vidlen at batch 512 would ship ~850 MB of features
    over the dev tunnel per variant just to stage the batch."""
    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    from bench import measure_training
    from tepose_tpu.train.trainer import TrainHyper

    def hp(b, dtype=None):
        n_2d = int(b * 0.6)  # the configs' DATA_2D_RATIO split
        kw = {"compute_dtype": dtype} if dtype else {}
        return TrainHyper(n_2d=n_2d, n_3d=b - n_2d, **kw)

    out = {}
    for label, h in (
            ("batch128_bf16", hp(128, "bfloat16")),
            ("batch256_f32", hp(256)),
            ("batch256_bf16", hp(256, "bfloat16")),
            ("batch512_bf16", hp(512, "bfloat16"))):
        try:
            r = measure_training(vidlen=vidlen, num_iters=num_iters, hp=h)
            out[label] = {
                "wps": round(r["wps"], 2),
                "samples_per_sec": round(
                    r["wps"] * (h.n_2d + h.n_3d), 0),
                "mfu": round(r["mfu"], 4) if r["mfu"] else None,
                "wps_spread": r.get("wps_spread"),
            }
        except Exception as e:  # OOM at the top of the curve is a finding
            out[label] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(f"knee: {label} -> {out[label]}", flush=True)
    out["note"] = ("vidlen 30 (upload bound over the dev tunnel); "
                   "per-iter compute is vidlen-independent, so MFU and "
                   "the batch-scaling shape are comparable with the "
                   "vidlen-126 rows, absolute wps slightly higher (less "
                   "window-gather indexing)")
    return out


def train_time_breakdown(hp=None, label="", with_disc_ablation=False):
    """Forward / backward / optimizer attribution of the GAN step.

    Same segment, three builds (trainer.make_train_segment `mode`):
    "forward" = loss values only, "grad" = forward+backward with the
    gradients kept alive by a square-reduce, "full" = the shipped step
    (the reduce adds one param-sized HBM read ~0.3-0.4 ms that upper-
    biases the backward attribution — noted where quoted). The deltas
    attribute the per-iteration time; all three keep the real window
    assembly + theta-ring recurrence. All three segments are built and
    warmed FIRST, then their timed reps are interleaved: the attribution
    lives in 1-3 ms/iter mode differences, and sequential measurements
    minutes apart would soak link/device drift into exactly those deltas
    (the effect bench.py's measure_end_to_end interleaving fixed for the
    output modes).

    `hp` re-runs the attribution at non-default shapes — VERDICT r4
    weak #1 asks for it at the shipped fast tier
    (TrainHyper(n_2d=76, n_3d=52, compute_dtype="bfloat16")).

    `with_disc_ablation` adds forward/grad builds with the motion
    discriminator replaced by a zero surrogate (trainer `ablate="disc"`):
    the full-vs-ablated deltas split the forward and backward costs into
    discriminator vs encoder+regressor+assembly IN SITU (no standalone
    micro-programs — those measure the ~3 ms/call link dispatch floor,
    not the component).
    """
    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    from bench import prepare_training

    variants = {"forward": ("forward", None), "grad": ("grad", None),
                "full": ("full", None)}
    if with_disc_ablation:
        variants["forward_nodisc"] = ("forward", "disc")
        variants["grad_nodisc"] = ("grad", "disc")
    prepared = {k: prepare_training(num_iters=60, hp=hp, mode=m,
                                    ablate=ab)
                for k, (m, ab) in variants.items()}
    # untimed burn cycles: the first timed loop after a compile window runs
    # far slower than steady state (device/link ramp, BENCH_NOTES
    # decision 8) — measured 24x on the forward segment once — and the
    # burn must happen right before timing, not at warmup-compile time
    for _ in range(2):
        for run, _ in prepared.values():
            run()
    reps = 5
    times = dict.fromkeys(variants, 0.0)
    for _ in range(reps):
        for m, (run, _) in prepared.items():
            t0 = time.time()
            run()
            times[m] += time.time() - t0
    res = {k: prepared[k][1](times[k] / reps) for k in variants}
    ms = lambda k: 1e3 / res[k]["wps"]  # noqa: E731
    out = {
        "forward_ms_per_iter": round(ms("forward"), 3),
        "backward_ms_per_iter": round(ms("grad") - ms("forward"), 3),
        "optimizer_ms_per_iter": round(ms("full") - ms("grad"), 3),
        "full_ms_per_iter": round(ms("full"), 3),
        "wps": {k: round(v["wps"], 1) for k, v in res.items()},
    }
    if with_disc_ablation:
        out["disc_fwd_ms_per_iter"] = round(
            ms("forward") - ms("forward_nodisc"), 3)
        out["disc_bwd_ms_per_iter"] = round(
            (ms("grad") - ms("grad_nodisc"))
            - (ms("forward") - ms("forward_nodisc")), 3)
        out["gen_fwd_ms_per_iter"] = round(ms("forward_nodisc"), 3)
        out["gen_bwd_ms_per_iter"] = round(
            ms("grad_nodisc") - ms("forward_nodisc"), 3)
    return out


def render_benchmark():
    """Host rasterizer throughput (VERDICT r4 #3): SMPL-sized mesh (6890
    verts / ~13.6k faces sphere-grid stand-in; real faces are
    license-gated), 1080p frame, several person sizes and counts, native
    vs numpy fallback. Host-only — the reference renders via pyrender/EGL
    on the GPU (ref: lib/utils/renderer.py:36-121); here rendering is CPU
    and must keep up with the video rate, not the TPU."""
    from tepose_tpu.native import (_render_mesh_numpy, have_native,
                                   render_mesh)

    nu = nv = 83  # 6889 verts, 13612 faces ~ SMPL's 6890/13776
    u = np.linspace(0, np.pi, nu)
    v = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    verts = np.stack([0.3 * np.sin(uu) * np.cos(vv), 0.9 * np.cos(uu),
                      0.3 * np.sin(uu) * np.sin(vv)],
                     -1).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(nu - 1):
        for j in range(nv):
            a, b = i * nv + j, i * nv + (j + 1) % nv
            c, d = (i + 1) * nv + j, (i + 1) * nv + (j + 1) % nv
            faces += [[a, b, c], [b, d, c]]
    faces = np.asarray(faces, np.int32)
    frame = np.zeros((1080, 1920, 3), np.uint8)

    def time_ms(fn, reps):
        fn()  # warm
        t0 = time.time()
        for _ in range(reps):
            fn()
        return (time.time() - t0) / reps * 1e3

    out = {"native": bool(have_native()),
           "mesh": f"{len(verts)} verts / {len(faces)} faces, 1080p"}
    # person sizes: cam sx scales the on-screen person (0.3 ~ a 330x960 px
    # demo person, 0.7 ~ frame-filling)
    for scale, label in [(0.15, "small_person"), (0.3, "typical_person"),
                         (0.7, "frame_filling_person")]:
        cam = np.array([scale, scale * 1.78, 0.0, 0.0], np.float32)
        ms = time_ms(lambda: render_mesh(verts, faces, cam, frame.copy()),
                     reps=8)
        out[f"native_{label}_ms"] = round(ms, 2)
        out[f"native_{label}_fps"] = round(1e3 / ms, 1)
    for n_people in (2, 4):
        offs = np.linspace(-0.9, 0.9, n_people)

        def multi():
            img = frame.copy()
            for k in range(n_people):
                render_mesh(verts, faces,
                            np.array([0.3, 0.55, offs[k] * 3, 0.0],
                                     np.float32), img)
        ms = time_ms(multi, reps=6)
        out[f"native_typical_{n_people}people_ms"] = round(ms, 2)
        out[f"native_typical_{n_people}people_fps"] = round(1e3 / ms, 1)
    cam = np.array([0.3, 0.534, 0.0, 0.0], np.float32)
    ms = time_ms(lambda: _render_mesh_numpy(
        verts, faces, cam, frame.copy(),
        np.array([1.0, 1.0, 0.9]), 0.9), reps=2)
    out["numpy_fallback_typical_person_ms"] = round(ms, 1)
    return out


def components_fast_tier(reps=8):
    """MXU shape-efficiency ceilings at the fast-tier train step's dominant
    matmul shapes (VERDICT r4 weak #1) — the measured ceiling each
    component should be judged against, not the 197 TFLOP/s chip peak.

    Chained (carry-dependent) matmuls inside one jit amortize the per-call
    link dispatch floor (measured ~3 ms — standalone per-component
    micro-programs are useless over this tunnel; the per-COMPONENT times
    come from the in-situ ablation deltas in train_time_breakdown
    instead). The serial chain is also the honest model for the GRU
    recurrence, which is serial by construction.
    """
    rng = np.random.RandomState(0)
    cd = jnp.bfloat16
    out = {}

    dummy = jax.device_put(jnp.ones((4,), cd))
    baseline = jax.jit(lambda a, b: (a[:1] + b[:1]).astype(jnp.float32))
    overhead = _sync_time(baseline, dummy, dummy, reps=reps)
    out["call_overhead_ms"] = round(overhead * 1e3, 3)

    mm = {}
    for name, (m, k, n) in {
            # GCN channel-mix convs: rows = N*T*V = 128*6*24
            "gcn_block2_mix_18432x832x128": (18432, 832, 128),
            "gcn_block3_mix_18432x1664x256": (18432, 1664, 256),
            # GRU recurrent / input steps: rows = batch
            "gru_step_128x1024x3072": (128, 1024, 3072),
            "gru_step_128x2133x3072": (128, 2133, 3072),
            # practical chip ceiling
            "square_4096": (4096, 4096, 4096),
    }.items():
        flop_one = 2 * m * k * n
        K = max(8, int(round(100e9 / flop_one)))  # >=100 GFLOP per call
        a = jax.device_put(jnp.asarray(
            rng.randn(m, k).astype(np.float32), dtype=cd))
        b = jax.device_put(jnp.asarray(
            rng.randn(k, n).astype(np.float32), dtype=cd))

        def make_chain(length):
            def chain(a, b):
                def body(c, _):
                    # The feedback path must not be factorable out of the
                    # matmul or XLA's algebraic simplifier removes the
                    # loop's work: `(a + eps*c1) @ b` strength-reduced to
                    # a hoisted a@b + rank-1 (574 "TFLOP/s" measured);
                    # `a * (1 + eps*c[:, :1])` is a row scaling, which
                    # COMMUTES with the matmul and was also rewritten.
                    # `d = c @ b.T` makes the next lhs depend densely on
                    # the whole previous product: two full matmuls per
                    # iteration, both counted below.
                    d = c @ b.T
                    return (a + d * 1e-9) @ b, None

                c0 = a @ b
                c, _ = jax.lax.scan(body, c0, None, length=length)
                return c.ravel()[:1].astype(jnp.float32)

            return jax.jit(chain)

        # two chain lengths; the difference cancels the per-call dispatch
        # and sync costs exactly (identical program structure). Each
        # iteration does 2 matmuls of flop_one each ((m,n)@(n,k) and
        # (m,k)@(k,n)).
        t1 = _sync_time(make_chain(K), a, b, reps=6)
        t2 = _sync_time(make_chain(2 * K), a, b, reps=6)
        dt = max(t2 - t1, 1e-9)
        tflops = round(2 * flop_one * K / dt / 1e12, 1)
        mm[name] = {"tflops": tflops, "chain_len": K,
                    **({"suspect": "exceeds chip peak — compiler "
                        "eliminated work"} if tflops > 207 else {})}
    out["matmul_shape_ceiling"] = mm
    return out


STAGES = ("render", "stage", "chunk", "scaling", "breakdown",
          "breakdown_fast", "knee", "components_fast")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="")
    ap.add_argument("--stages", default="render,stage,chunk,scaling,"
                                        "breakdown",
                    help=f"comma list from {STAGES}; 'knee' and "
                         "'breakdown_fast' are the fast-tier MFU probes "
                         "(VERDICT r4 weak #1), off by default because "
                         "they re-compile big-batch segments")
    args = ap.parse_args()
    sel = set(args.stages.split(","))
    bad = sel - set(STAGES)
    if bad:
        ap.error(f"unknown stages {sorted(bad)}")

    import contextlib

    from tepose_tpu.utils.profiling import trace

    ctx = trace(args.profile) if args.profile else contextlib.nullcontext()
    out = {}
    with ctx:
        if "render" in sel:  # host-only, before any device work
            out["render_benchmark"] = render_benchmark()
        if "stage" in sel:
            out["stage_breakdown"] = stage_breakdown()
        if "chunk" in sel:
            out["backbone_chunk_sweep_crops_per_s"] = backbone_chunk_sweep()
        if "scaling" in sel:
            out["train_batch_scaling"] = train_batch_scaling()
        if "breakdown" in sel:
            out["train_time_breakdown"] = train_time_breakdown()
        if "breakdown_fast" in sel:
            from tepose_tpu.train.trainer import TrainHyper

            out["train_time_breakdown_fast_tier"] = train_time_breakdown(
                hp=TrainHyper(n_2d=76, n_3d=52,
                              compute_dtype="bfloat16"),
                with_disc_ablation=True)
        if "knee" in sel:
            out["train_batch_knee"] = train_batch_knee()
        if "components_fast" in sel:
            out["components_fast_tier"] = components_fast_tier()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

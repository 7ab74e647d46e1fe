#!/usr/bin/env python
"""Training CLI — reference-compatible surface.

ref: train.py (reference). Usage:

  python train.py --cfg configs/repr_wopw_3dpw_model.yaml
  python train.py --cfg ... --synthetic     # smoke-run on generated data

The whole inner training loop (scheduled sampling, theta feedback, GAN
updates over NUM_ITERS_PER_EPOCH sliding windows) runs as ONE device program
per outer batch (tepose_tpu.train.trainer.make_train_segment).
"""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np  # noqa: E402

from tepose_tpu.parallel import distributed  # noqa: E402
from tepose_tpu.utils.cache import enable_persistent_cache  # noqa: E402

# Join the multi-host coordination service FIRST (no-op unless the pod
# launcher set TEPOSE_COORDINATOR/...): enable_persistent_cache queries the
# backend, and jax.distributed.initialize must precede any backend init.
# After this, jax.devices() is the global pod-wide list
# (parallel/distributed.py).
distributed.maybe_initialize()
enable_persistent_cache()



def synthetic_loaders(cfg, seed=0, num_shards=1, shard_index=0):
    """In-memory synthetic DBs wired through the real dataset/loader stack.

    Sized to the configured batch: the loaders drop incomplete batches, so
    the DBs must hold at least one full batch of videos/clips each.
    Multi-process: the DBs are seed-deterministic, so every process builds
    identical data and the sharded loaders slice it per host."""
    from tests.test_datasets import synthetic_2d_db, synthetic_3d_db

    rs = np.random.RandomState(seed)
    vl = cfg.DATASET.VIDLEN
    sl = cfg.DATASET.SEQLEN
    n_videos = max(6, cfg.TRAIN.BATCH_SIZE + 2)
    # each 2-channel 2D item packs ~ceil((vidlen-seqlen+2)/(clip-seqlen+1))
    # clips (chunking.combine_into_chunks), and the 2D batch needs
    # BATCH_SIZE*DATA_2D_RATIO whole items per step. clip_len scales with
    # seqlen (clip-seqlen+1 must stay positive) and vidlen (bounds the
    # synthetic DB size for long-VIDLEN configs)
    clip_len = max(2 * sl, vl // 8)
    clips_per_item = -(-(vl - sl + 2) // (clip_len - sl + 1))
    n_2d = int(cfg.TRAIN.BATCH_SIZE * cfg.TRAIN.DATA_2D_RATIO)  # ref trunc
    n_clips = max(20, (n_2d + 2) * clips_per_item)
    db3, pse3 = synthetic_3d_db(
        rs, videos=tuple((vl + 10, f"v{i}") for i in range(n_videos)))
    db2, pse2 = synthetic_2d_db(
        rs, clips=tuple((clip_len, f"c{i}") for i in range(n_clips)))
    # the discriminator loader draws BATCH_SIZE windows per step; the AMASS
    # mocap stream yields ~frames/seqlen windows, so size it to the batch
    n_amass = max(400, (cfg.TRAIN.BATCH_SIZE + 4) * sl + sl)
    amass = {"vid_name": np.array(["m"] * n_amass),
             "theta": rs.randn(n_amass, 82).astype(np.float32) * 0.2}
    over = {name: (db3, pse3) for name in
            ("mpii3d", "h36m", "human36m", "3dpw", "threedpw")}
    over.update({"posetrack": (db2, pse2), "insta": (db2, pse2),
                 "amass": (amass, None)})
    from tepose_tpu.data.loaders import get_data_loaders

    return get_data_loaders(cfg, db_overrides=over, num_shards=num_shards,
                            shard_index=shard_index)


def main():
    import jax
    import jax.numpy as jnp

    from tepose_tpu.config import BASE_DATA_DIR, parse_args
    from tepose_tpu.data.loaders import get_data_loaders
    from tepose_tpu.models.gcn import motion_discriminator_init
    from tepose_tpu.models.smpl import load_smpl_assets, synthetic_smpl_model
    from tepose_tpu.models.tepose import TePoseConfig, tepose_init
    from tepose_tpu.train.checkpoint import load_checkpoint
    from tepose_tpu.train.fit import TrainLoop
    from tepose_tpu.train.loss import LossWeights
    from tepose_tpu.train.optim import make_optimizer
    from tepose_tpu.train.trainer import (
        TrainHyper, make_packed_train_segment)
    from tepose_tpu.utils.logging import prepare_output_dir

    synthetic = "--synthetic" in sys.argv
    if synthetic:
        sys.argv.remove("--synthetic")
    smoke_iters = None
    if "--smoke-iters" in sys.argv:
        i = sys.argv.index("--smoke-iters")
        smoke_iters = int(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    # synthetic-only: shrink the synthetic SMPL so subprocess smoke tests
    # (e.g. the 2-process CPU rig, tests/test_multiprocess.py) compile fast
    smoke_verts = None
    if "--smoke-verts" in sys.argv:
        i = sys.argv.index("--smoke-verts")
        smoke_verts = int(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    devices = 1
    if "--devices" in sys.argv:
        i = sys.argv.index("--devices")
        devices = sys.argv[i + 1]
        del sys.argv[i:i + 2]
        devices = len(jax.devices()) if devices == "auto" else int(devices)
    if distributed.process_count() > 1:
        # multi-process runtime: the mesh must span every host's devices
        # (jax arrays assemble from per-process local shards)
        if devices not in (1, len(jax.devices())):
            raise SystemExit(
                f"multi-process training uses all {len(jax.devices())} "
                f"global devices; drop --devices or pass 'auto'")
        devices = len(jax.devices())
    profile_dir = None
    if "--profile" in sys.argv:
        i = sys.argv.index("--profile")
        profile_dir = sys.argv[i + 1]
        del sys.argv[i:i + 2]
    # --precision bf16: mixed-precision GAN passes (bf16 weights/activations,
    # f32 master weights/optimiser/BN stats/losses) — measured 1.18x
    # windows/s at flagship shapes on v5e (BENCH_NOTES.md); gradient
    # agreement with the f32 path is pinned in tests/test_trainer.py.
    # Default f32 keeps exact reference parity.
    compute_dtype = None
    if "--precision" in sys.argv:
        i = sys.argv.index("--precision")
        if i + 1 >= len(sys.argv):
            raise SystemExit("--precision needs a value (bf16 or float32)")
        prec = sys.argv[i + 1]
        del sys.argv[i:i + 2]
        if prec in ("bf16", "bfloat16"):
            compute_dtype = "bfloat16"
        elif prec not in ("f32", "float32", "default"):
            raise SystemExit(f"unknown --precision {prec!r} "
                             "(choose bf16 or float32)")

    cfg, cfg_file, args = parse_args()
    if compute_dtype is None and cfg.TRAIN.PRECISION:
        # config-file precision (configs/fast_train.yaml); CLI flag wins
        prec = str(cfg.TRAIN.PRECISION)
        if prec in ("bf16", "bfloat16"):
            compute_dtype = "bfloat16"
        elif prec not in ("f32", "float32", "default"):
            raise SystemExit(f"unknown TRAIN.PRECISION {prec!r} "
                             "(choose bf16 or float32)")
    logdir = prepare_output_dir(cfg, cfg_file)
    if cfg.SEED_VALUE >= 0:
        np.random.seed(cfg.SEED_VALUE)

    # models ---------------------------------------------------------------
    # fast_encoder: numerically equivalent lane-batched GRUs; same step
    # time at batch 32 but ~2.4x faster compile (measured on v5e; also fine
    # under a GSPMD mesh — see tests/test_multichip_train.py)
    model_cfg = TePoseConfig(seqlen=cfg.DATASET.SEQLEN,
                             n_layers=cfg.MODEL.TGRU.NUM_LAYERS,
                             hidden_size=cfg.MODEL.TGRU.HIDDEN_SIZE,
                             fast_encoder=True)
    smpl_npz = osp.join(BASE_DATA_DIR, "smpl_neutral.npz")
    if osp.isfile(smpl_npz):
        from tepose_tpu.models.smpl import load_smpl_faces

        smpl = load_smpl_assets(smpl_npz)
        faces = load_smpl_faces(smpl_npz)
    elif synthetic:
        smpl = (synthetic_smpl_model(seed=0, num_verts=smoke_verts)
                if smoke_verts else synthetic_smpl_model(seed=0))
        # triangle soup so the DEBUG mesh-overlay path renders something
        idx = np.arange(smpl.num_verts - 2)
        faces = np.stack([idx, idx + 1, idx + 2], axis=1)[::7].astype(np.int32)
    else:
        raise FileNotFoundError(f"{smpl_npz} missing — see tools/convert_smpl")
    if faces is not None and len(faces) == 0:
        faces = None

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        gen_params = tepose_init(jax.random.PRNGKey(0), model_cfg)
        gcn = cfg.TRAIN.MOT_DISCR.GCN
        disc_params, disc_state = motion_discriminator_init(
            jax.random.PRNGKey(1), num_class=gcn.num_class,
            num_point=gcn.num_point, num_gcn_scales=gcn.num_gcn_scales,
            num_g3d_scales=gcn.num_g3d_scales)

    # warm-start the regressor from converted SPIN weights
    # (ref: tepose.py:115-119)
    if cfg.TRAIN.PRETRAINED_REGRESSOR and \
            osp.isfile(cfg.TRAIN.PRETRAINED_REGRESSOR):
        trees, _ = load_checkpoint(cfg.TRAIN.PRETRAINED_REGRESSOR)
        reg = trees.get("gen", {}).get("regressor", {})
        for k, v in reg.items():
            gen_params["regressor"][k] = (
                {kk: jnp.asarray(vv) for kk, vv in v.items()}
                if isinstance(v, dict) else jnp.asarray(v))
        print(f"=> loaded pretrained regressor from "
              f"'{cfg.TRAIN.PRETRAINED_REGRESSOR}'")

    # data -----------------------------------------------------------------
    # per-host data loading: each process assembles only its slice of every
    # global batch (SURVEY.md §2.6; data/loaders.BatchLoader num_shards)
    shard_kw = dict(num_shards=distributed.process_count(),
                    shard_index=distributed.process_index())
    loaders = (synthetic_loaders(cfg, **shard_kw) if synthetic
               else get_data_loaders(cfg, **shard_kw))

    n_2d = int(cfg.TRAIN.BATCH_SIZE * cfg.TRAIN.DATA_2D_RATIO)  # ref trunc
    hp = TrainHyper(
        seqlen=cfg.DATASET.SEQLEN, n_2d=n_2d,
        n_3d=cfg.TRAIN.BATCH_SIZE - n_2d,
        update_theta_rate=cfg.TRAIN.UPDATE_THETA_RATE,
        disc_update_steps=cfg.TRAIN.MOT_DISCR.UPDATE_STEPS,
        num_gcn_scales=cfg.TRAIN.MOT_DISCR.GCN.num_gcn_scales,
        num_g3d_scales=cfg.TRAIN.MOT_DISCR.GCN.num_g3d_scales,
        compute_dtype=compute_dtype)

    gen_tx = make_optimizer(cfg.TRAIN.GEN_OPTIM, cfg.TRAIN.GEN_LR,
                            cfg.TRAIN.GEN_WD, cfg.TRAIN.GEN_MOMENTUM)
    disc_tx = make_optimizer(cfg.TRAIN.MOT_DISCR.OPTIM, cfg.TRAIN.MOT_DISCR.LR,
                             cfg.TRAIN.MOT_DISCR.WD,
                             cfg.TRAIN.MOT_DISCR.MOMENTUM)
    weights = LossWeights(kp_2d=cfg.LOSS.KP_2D_W, kp_3d=cfg.LOSS.KP_3D_W,
                          pose=cfg.LOSS.POSE_W, shape=cfg.LOSS.SHAPE_W,
                          d_motion=cfg.LOSS.D_MOTION_LOSS_W)

    num_iters = smoke_iters or cfg.TRAIN.NUM_ITERS_PER_EPOCH
    import functools
    if devices > 1:
        # data-parallel mesh training: weights replicated, batches sharded,
        # GSPMD collectives keep numerics identical to 1-device (see
        # parallel/dp.py and tests/test_multichip_train.py)
        from tepose_tpu.parallel.dp import (
            check_divisible, make_sharded_train_segment)
        from tepose_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < devices:
            raise RuntimeError(
                f"--devices {devices} requested but only "
                f"{len(jax.devices())} JAX devices are visible")
        check_divisible(hp, devices)
        mesh = make_mesh(devices)
        print(f"=> data-parallel training over {devices} devices: "
              f"{[str(d) for d in mesh.devices.flat]}")
        segment_factory = functools.partial(
            make_sharded_train_segment, smpl, model_cfg, hp, gen_tx,
            disc_tx, weights, num_iters, mesh)
    else:
        segment_factory = functools.partial(
            make_packed_train_segment, smpl, model_cfg, hp, gen_tx, disc_tx,
            weights, num_iters)

    jreg_path = osp.join(BASE_DATA_DIR, "J_regressor_h36m.npy")
    if osp.isfile(jreg_path):
        j_regressor = np.load(jreg_path).astype(np.float32)
    else:
        rs = np.random.RandomState(7)
        j_regressor = (rs.rand(17, smpl.num_verts) ** 8).astype(np.float32)
        j_regressor /= j_regressor.sum(1, keepdims=True)

    loop = TrainLoop(cfg=cfg, segment_factory=segment_factory, smpl=smpl,
                     model_cfg=model_cfg, hp=hp, gen_params=gen_params,
                     disc_params=disc_params, disc_state=disc_state,
                     gen_tx=gen_tx, disc_tx=disc_tx, loaders=loaders,
                     j_regressor=j_regressor, logdir=logdir,
                     num_iters_per_epoch=num_iters,
                     seed=max(cfg.SEED_VALUE, 0), faces=faces)

    # the reference consumes len(train_3d)/8 outer batches per epoch
    # (trainer.py:147)
    num_outer = max(1, len(loop.train_3d) // 8)
    if synthetic:
        num_outer = 1
    if profile_dir:
        import contextlib

        from tepose_tpu.utils.profiling import trace

        with trace(profile_dir):
            loop.fit(cfg.TRAIN.END_EPOCH, num_outer)
    else:
        loop.fit(cfg.TRAIN.END_EPOCH, num_outer)


if __name__ == "__main__":
    main()

"""1-device vs 8-device training equivalence on the virtual CPU mesh.

The data-parallel segment (parallel/dp.py) must be *numerically* the same
program as the single-device one — GSPMD collectives implement the global
masked means / BatchNorm batch stats / gradient sums, not per-replica
approximations. Same seed => same metrics and same updated parameters, to fp
reduction-order tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tepose_tpu.models.gcn import motion_discriminator_init
from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import TePoseConfig, tepose_init
from tepose_tpu.parallel.dp import check_divisible, make_sharded_train_segment
from tepose_tpu.parallel.mesh import make_mesh
from tepose_tpu.train.loss import LossWeights
from tepose_tpu.train.optim import make_optimizer
from tepose_tpu.train.trainer import TrainHyper, make_train_segment

from tests.test_trainer import _tiny_batches


def _setup(rng, num_iters=3):
    hp = TrainHyper(seqlen=6, n_2d=8, n_3d=8, update_theta_rate=0.9,
                    disc_update_steps=1, num_gcn_scales=3, num_g3d_scales=2)
    model_cfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=32)
    smpl = synthetic_smpl_model(seed=0, num_verts=64)

    gen_params = tepose_init(jax.random.PRNGKey(0), model_cfg)
    disc_params, disc_state = motion_discriminator_init(
        jax.random.PRNGKey(1), num_gcn_scales=3, num_g3d_scales=2)
    gen_tx = make_optimizer("adam", 1e-4)
    disc_tx = make_optimizer("adam", 1e-4, weight_decay=1e-4)
    gen_opt = gen_tx.init(gen_params)
    disc_opt = disc_tx.init(disc_params)

    batch_2d, batch_3d = _tiny_batches(rng, hp)
    amass = rng.randn(num_iters, hp.n_2d + hp.n_3d, hp.seqlen, 85) \
        .astype(np.float32) * 0.1
    return (hp, model_cfg, smpl, gen_tx, disc_tx,
            (gen_params, disc_params, disc_state, gen_opt, disc_opt),
            {"batch_2d": batch_2d, "batch_3d": batch_3d,
             "amass": jnp.asarray(amass)})


def test_dp_segment_matches_single_device(rng):
    num_iters = 3
    (hp, model_cfg, smpl, gen_tx, disc_tx, carry, data) = _setup(
        rng, num_iters)
    key = jax.random.PRNGKey(42)

    # ---- single device ----------------------------------------------------
    seg1 = make_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx,
                              LossWeights(), num_iters)
    carry_copy = jax.tree_util.tree_map(jnp.array, carry)
    out1 = seg1(*carry_copy, data["batch_2d"], data["batch_3d"],
                data["amass"], key)
    gen1, metrics1 = out1[0], {k: float(v) for k, v in out1[5].items()}

    # ---- 8-device mesh ----------------------------------------------------
    mesh = make_mesh(8)
    seg8, carry_placer, data_placer = make_sharded_train_segment(
        smpl, model_cfg, hp, gen_tx, disc_tx, LossWeights(), num_iters,
        mesh, carry, data)
    carry_leaves = carry_placer.pack_np(carry)
    data_leaves = data_placer.pack_np(data)
    # batches really are sharded over the mesh
    feat = data_leaves[1]  # amass < batch_2d: first batch_2d leaf
    assert len(feat.sharding.device_set) == 8, feat.sharding

    new_leaves, mvec = seg8(carry_leaves, data_leaves, key)
    names = seg8.metric_names()
    metrics8 = dict(zip(names, np.asarray(mvec).tolist()))
    gen8 = carry_placer.unpack_np(new_leaves)[0]

    # same metrics ...
    for k, v in metrics1.items():
        np.testing.assert_allclose(metrics8[k], v, rtol=2e-4, atol=1e-6,
                                   err_msg=k)
    # ... and same updated generator parameters
    flat1 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, gen1))
    flat8 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, gen8))
    assert len(flat1) == len(flat8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=5e-5)


def test_dp_segment_bf16_compute_composes(rng):
    """--devices N and --precision bf16 compose: the sharded bf16 segment
    runs, keeps f32 master weights, and stays near the single-device bf16
    result (cross-device reduction order moves bf16 sums more than f32)."""
    num_iters = 2
    (hp, model_cfg, smpl, gen_tx, disc_tx, carry, data) = _setup(
        rng, num_iters)
    hp = TrainHyper(**{**hp.__dict__, "compute_dtype": "bfloat16"})
    key = jax.random.PRNGKey(42)

    seg1 = make_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx,
                              LossWeights(), num_iters)
    carry_copy = jax.tree_util.tree_map(jnp.array, carry)
    out1 = seg1(*carry_copy, data["batch_2d"], data["batch_3d"],
                data["amass"], key)
    metrics1 = {k: float(v) for k, v in out1[5].items()}

    mesh = make_mesh(8)
    seg8, carry_placer, data_placer = make_sharded_train_segment(
        smpl, model_cfg, hp, gen_tx, disc_tx, LossWeights(), num_iters,
        mesh, carry, data)
    new_leaves, mvec = seg8(carry_placer.pack_np(carry),
                            data_placer.pack_np(data), key)
    metrics8 = dict(zip(seg8.metric_names(), np.asarray(mvec).tolist()))

    for k, v in metrics1.items():
        assert np.isfinite(metrics8[k]), k
        np.testing.assert_allclose(metrics8[k], v, rtol=2e-2, atol=1e-4,
                                   err_msg=k)
    # master weights stay f32 on the mesh
    gen8 = carry_placer.unpack_np(new_leaves)[0]
    for leaf in jax.tree_util.tree_leaves(gen8):
        assert np.asarray(leaf).dtype == np.float32


def test_divisibility_guard():
    hp = TrainHyper(n_2d=19, n_3d=13)
    with pytest.raises(ValueError, match="not divisible"):
        check_divisible(hp, 8)
    check_divisible(TrainHyper(n_2d=16, n_3d=16), 8)  # flagship split is fine


def test_train_cli_devices_flag(tmp_path, monkeypatch):
    """python train.py --synthetic --devices 8 runs the sharded path
    end to end (tiny smoke config)."""
    import functools
    import sys

    import train as train_cli
    import tepose_tpu.models.smpl as smpl_mod

    # full-size 6890-vert SMPL grad compile is too slow for a CPU smoke test
    monkeypatch.setattr(
        smpl_mod, "synthetic_smpl_model",
        functools.partial(synthetic_smpl_model, num_verts=64))

    cfg_file = tmp_path / "tiny.yaml"
    cfg_file.write_text(
        "DEBUG: false\n"
        "OUTPUT_DIR: " + str(tmp_path / "out") + "\n"
        "TRAIN:\n"
        "  BATCH_SIZE: 16\n"
        "  DATA_2D_RATIO: 0.5\n"
        "  END_EPOCH: 1\n"
        "  NUM_ITERS_PER_EPOCH: 2\n"
        "  MOT_DISCR:\n"
        "    GCN:\n"
        "      num_gcn_scales: 3\n"
        "      num_g3d_scales: 2\n"
        "MODEL:\n"
        "  TGRU:\n"
        "    NUM_LAYERS: 1\n"
        "    HIDDEN_SIZE: 32\n"
        "DATASET:\n"
        "  SEQLEN: 6\n"
        "  VIDLEN: 12\n")
    monkeypatch.setattr(sys, "argv",
                        ["train.py", "--cfg", str(cfg_file), "--synthetic",
                         "--devices", "8"])
    train_cli.main()
    out_dirs = list((tmp_path / "out").glob("**/checkpoint.npz"))
    assert out_dirs, "training produced no checkpoint"

"""Config system tests: defaults, YAML merge, CLI surface."""

import os

from tepose_tpu.config import get_cfg_defaults, parse_args, update_cfg

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def test_defaults_schema():
    cfg = get_cfg_defaults()
    assert cfg.DATASET.SEQLEN == 20
    assert cfg.TRAIN.MOT_DISCR.GCN.num_gcn_scales == 13
    assert cfg.MODEL.TGRU.HIDDEN_SIZE == 2048
    assert cfg.LOSS.KP_2D_W == 60.0


def test_yaml_merge_repr_config():
    cfg = update_cfg(os.path.join(CONFIG_DIR, "repr_wopw_3dpw_model.yaml"))
    assert cfg.TITLE == "repr_wopw_3dpw_model"
    assert cfg.DATASET.SEQLEN == 6
    assert cfg.DATASET.VIDLEN == 520
    assert cfg.MODEL.TGRU.NUM_LAYERS == 2
    assert cfg.MODEL.TGRU.HIDDEN_SIZE == 1024
    assert cfg.LOSS.KP_2D_W == 300.0
    assert cfg.LOSS.D_MOTION_LOSS_W == 0.5
    assert cfg.TRAIN.UPDATE_THETA_RATE == 0.9
    assert cfg.TRAIN.DATA_2D_RATIO == 0.6
    assert cfg.TRAIN.DATASETS_2D == ["Insta", "PoseTrack"]
    assert cfg.TRAIN.DATASET_EVAL == "ThreeDPW"
    # defaults not overridden survive
    assert cfg.TRAIN.MOT_DISCR.UPDATE_STEPS == 1
    assert cfg.TRAIN.MOT_DISCR.GCN.num_point == 24


def test_all_repr_configs_load():
    for name in os.listdir(CONFIG_DIR):
        cfg = update_cfg(os.path.join(CONFIG_DIR, name))
        # parity configs keep the reference batch 32; fast_train is the
        # deliberate throughput composition (VERDICT r3 #6)
        expected = 128 if name == "fast_train.yaml" else 32
        assert cfg.TRAIN.BATCH_SIZE == expected, name


def test_fast_train_config_composition():
    """configs/fast_train.yaml must compose the measured knobs: batch 128
    (76 2D + 52 3D under the reference's truncating ratio split) + bf16."""
    cfg = update_cfg(os.path.join(CONFIG_DIR, "fast_train.yaml"))
    assert cfg.TRAIN.BATCH_SIZE == 128
    assert cfg.TRAIN.PRECISION == "bf16"
    n_2d = int(cfg.TRAIN.BATCH_SIZE * cfg.TRAIN.DATA_2D_RATIO)
    assert (n_2d, cfg.TRAIN.BATCH_SIZE - n_2d) == (76, 52)
    # the 76/52 split shards over a 2- or 4-chip data-parallel mesh
    # (parallel/dp.check_divisible needs each split divisible; 8 chips
    # need DATA_2D_RATIO 0.5 -> 64/64, as the yaml comment documents)
    assert n_2d % 4 == 0 and (cfg.TRAIN.BATCH_SIZE - n_2d) % 4 == 0
    # everything else matches the flagship parity schedule
    ref = update_cfg(os.path.join(CONFIG_DIR, "repr_wopw_3dpw_model.yaml"))
    assert cfg.DATASET.SEQLEN == ref.DATASET.SEQLEN
    assert cfg.TRAIN.GEN_LR == ref.TRAIN.GEN_LR
    assert cfg.MODEL.TGRU.HIDDEN_SIZE == ref.MODEL.TGRU.HIDDEN_SIZE


def test_parse_args_cli():
    cfg, cfg_file, args = parse_args([
        "--cfg", os.path.join(CONFIG_DIR, "repr_wpw_3dpw_model.yaml"),
        "--dataset", "h36m", "--render", "--frame", "7"])
    assert args.dataset == "h36m"
    assert args.frame == 7
    assert cfg.render is True
    assert cfg.TITLE == "repr_wpw_3dpw_model"
    assert cfg.TRAIN.OVERLAP is True


def test_dump_roundtrip(tmp_path):
    cfg = get_cfg_defaults()
    p = tmp_path / "dumped.yaml"
    p.write_text(cfg.dump())
    cfg2 = update_cfg(str(p))
    assert cfg2.TRAIN.BATCH_SIZE == cfg.TRAIN.BATCH_SIZE

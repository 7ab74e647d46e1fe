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
        assert cfg.TRAIN.BATCH_SIZE == 32


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

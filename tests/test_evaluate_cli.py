"""evaluate.py run_eval smoke across all three dataset paths (synthetic
data, tiny SMPL), exercising the per-dataset joint conventions and masks."""

import os.path as osp
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import evaluate  # noqa: E402
from tepose_tpu.config import get_cfg_defaults  # noqa: E402


def _args(dataset):
    return types.SimpleNamespace(dataset=dataset, seq="", render=False,
                                 render_plain=False, filter=False,
                                 plot=False, frame=0)


def _cfg():
    cfg = get_cfg_defaults()
    cfg.TITLE = "repr_wopw_3dpw_model"
    cfg.DATASET.SEQLEN = 6
    cfg.MODEL.TGRU.NUM_LAYERS = 1
    cfg.MODEL.TGRU.HIDDEN_SIZE = 16
    return cfg


@pytest.fixture(autouse=True)
def small_smpl(monkeypatch):
    import tepose_tpu.models.smpl as smplmod

    orig = smplmod.synthetic_smpl_model
    monkeypatch.setattr(evaluate, "synthetic_eval_data",
                        lambda **kw: evaluate.synthetic_eval_data.__wrapped__(
                            **kw) if hasattr(
                            evaluate.synthetic_eval_data, "__wrapped__")
                        else _tiny_eval_data())
    # shrink the synthetic SMPL everywhere evaluate builds it
    import tepose_tpu

    def tiny(seed=0, num_verts=6890):
        return orig(seed, 96)

    monkeypatch.setattr(smplmod, "synthetic_smpl_model", tiny)
    yield


def _tiny_eval_data(num_videos=2, seed=0):
    rs = np.random.RandomState(seed)
    data = {}
    for i in range(num_videos):
        n = int(rs.randint(20, 40))
        data[f"vid_{i}"] = {
            "features": rs.randn(n, 2048).astype(np.float32) * 0.1,
            "joints3D": rs.randn(n, 49, 3).astype(np.float32) * 0.2,
            "theta_pseu": np.concatenate(
                [np.tile([1.0, 0, 0], (n, 1)),
                 rs.randn(n, 82) * 0.1], axis=1).astype(np.float32),
            "pose": (rs.randn(n, 72) * 0.2).astype(np.float32),
            "shape": (rs.randn(n, 10) * 0.2).astype(np.float32),
            "valid_i": np.ones((n, 1), np.float32),
        }
    return data


def test_run_eval_3dpw():
    res = evaluate.run_eval(_cfg(), _args("3dpw"), synthetic=True)
    for k in ("mpjpe", "pa_mpjpe", "mpvpe", "accel_err"):
        assert k in res and np.isfinite(res[k]), (k, res)


def test_run_eval_h36m():
    res = evaluate.run_eval(_cfg(), _args("h36m"), synthetic=True)
    assert "mpjpe" in res and "mpvpe" not in res  # mpvpe only for 3dpw
    assert np.isfinite(res["pa_mpjpe"])


def test_run_eval_mpii3d(monkeypatch):
    # mpii3d path: spin49 predictions, spin->mpii3d_test conversion, valid_i
    monkeypatch.setattr(evaluate, "synthetic_eval_data",
                        lambda **kw: _tiny_eval_data())
    res = evaluate.run_eval(_cfg(), _args("mpii3d"), synthetic=True)
    assert np.isfinite(res["mpjpe"]) and np.isfinite(res["pa_mpjpe"])


def test_run_eval_devices_matches_single(monkeypatch):
    """--devices 8 (DP eval over the CPU mesh) reports the same metrics as
    the single-device packed path on the same data."""
    monkeypatch.setattr(evaluate, "synthetic_eval_data",
                        lambda **kw: _tiny_eval_data())
    single = evaluate.run_eval(_cfg(), _args("3dpw"), synthetic=True)
    sharded = evaluate.run_eval(_cfg(), _args("3dpw"), synthetic=True,
                                devices=8)
    for k in single:
        np.testing.assert_allclose(sharded[k], single[k], rtol=1e-4,
                                   err_msg=k)


def test_run_eval_filter_path(monkeypatch):
    monkeypatch.setattr(evaluate, "synthetic_eval_data",
                        lambda **kw: _tiny_eval_data(num_videos=1))
    args = _args("3dpw")
    args.filter = True  # slerp smoothing + SMPL re-run + J14 re-regression
    res = evaluate.run_eval(_cfg(), args, synthetic=True)
    assert np.isfinite(res["pa_mpjpe"])

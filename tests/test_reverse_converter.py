"""Reverse checkpoint conversion: our .npz -> reference-layout .pth.tar.

Round-trips through the reference's OWN modules: a torch state_dict is
converted to our pytree (the production forward converter), exported back,
and must (a) be bit-identical tensor-for-tensor and (b) strict-load into a
fresh reference module. The CLI file path (`--reverse --like`) is rehearsed
the same way the forward direction is in
test_reference_eval_parity.py::test_checkpoint_file_conversion_rehearsal.

ref: lib/core/trainer.py:392-401 (checkpoint layout), evaluate.py:124 and
trainer.py:423 (strict load_state_dict the output must satisfy).
"""

import os
import sys

import numpy as np
import pytest
import torch

import reference_shims as shims
from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.train.checkpoint import (
    convert_torch_discriminator,
    convert_torch_generator,
    export_torch_discriminator,
    export_torch_generator,
)

NUM_VERTS = 300


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    shims.install_reference()
    root = tmp_path_factory.mktemp("refdata")

    smpl = synthetic_smpl_model(seed=3, num_verts=NUM_VERTS)
    rs = np.random.RandomState(11)
    ident6d = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24)
    mean = {
        "pose": ident6d + rs.randn(144).astype(np.float32) * 0.05,
        "shape": rs.randn(10).astype(np.float32) * 0.03,
        "cam": np.array([0.9, 0.01, -0.02], np.float32),
    }
    shims.set_model_npz(shims.save_model_npz(smpl, root / "smpl.npz"))
    shims.make_base_data(str(root), smpl, mean)

    old = os.getcwd()
    os.chdir(root)
    yield {"smpl": smpl, "mean": mean}
    os.chdir(old)


def _ref_tepose(hidden=64):
    from lib.models.tepose import TePose

    torch.manual_seed(7)
    model = TePose(seqlen=6, n_layers=2, hidden_size=hidden, pretrained="")
    model.eval()
    return model


def _ref_disc(seed=9):
    from lib.models.motion_discriminator_gcn import MotionDiscriminatorGCN

    torch.manual_seed(seed)
    disc = MotionDiscriminatorGCN(
        num_class=2, num_point=24, num_person=1, num_gcn_scales=13,
        num_g3d_scales=6, graph="lib.graph.smplx_theta.AdjMatrixGraph")
    # non-trivial BN stats so the exported running stats are meaningful
    g = torch.Generator().manual_seed(3)
    for m in disc.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) * 0.8 + 0.6)
    disc.eval()
    return disc


def test_generator_export_roundtrip(ref_env):
    model = _ref_tepose()
    sd = model.state_dict()
    exported = export_torch_generator(convert_torch_generator(sd))

    # every exported tensor bit-equal to the torch original
    for key, val in exported.items():
        assert key in sd, key
        np.testing.assert_array_equal(val, sd[key].numpy(), err_msg=key)
    # the only torch-side keys we do not own are the smpl constant buffers
    missing = set(sd) - set(exported)
    assert missing == {k for k in sd if k.startswith("regressor.smpl.")}

    # strict-load into a fresh module once the smpl buffers are overlaid
    merged = {k: torch.from_numpy(np.array(v))
              for k, v in exported.items()}
    merged.update({k: sd[k] for k in missing})
    fresh = _ref_tepose()
    fresh.load_state_dict(merged)  # strict=True (ref: evaluate.py:124)


def test_discriminator_export_roundtrip(ref_env):
    disc = _ref_disc()
    sd = disc.state_dict()
    params, state = convert_torch_discriminator(sd)
    exported = export_torch_discriminator(params, state)

    assert set(exported) == set(sd)
    for key, val in exported.items():
        if key.endswith("num_batches_tracked"):
            continue  # synthesised as 0 (only affects momentum=None BN)
        np.testing.assert_array_equal(val, sd[key].numpy(), err_msg=key)

    merged = {k: torch.from_numpy(np.array(v))
              for k, v in exported.items()}
    fresh = _ref_disc(seed=1)
    fresh.load_state_dict(merged)  # strict=True (ref: trainer.py:429)
    x = torch.randn(2, 6, 72, generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        np.testing.assert_array_equal(fresh(x).numpy(),
                                      disc(x).numpy())


def test_reverse_cli_file_level(ref_env, tmp_path, monkeypatch):
    """Exact byte path: torch ckpt -> forward CLI npz -> reverse CLI
    pth.tar (--like the original) -> strict loads + identical tensors."""
    sys.path.insert(0, "/root/repo/tools")
    import convert_checkpoint as cc

    model = _ref_tepose()
    disc = _ref_disc()
    src = tmp_path / "ref_ckpt.pth.tar"
    torch.save({"gen_state_dict": model.state_dict(),
                "disc_motion_state_dict": disc.state_dict(),
                "performance": 52.3, "epoch": 7}, src)

    npz = tmp_path / "ours.npz"
    monkeypatch.setattr(sys, "argv",
                        ["convert_checkpoint.py", str(src), str(npz),
                         "--kind", "tepose"])
    cc.main()

    back = tmp_path / "back.pth.tar"
    monkeypatch.setattr(sys, "argv",
                        ["convert_checkpoint.py", str(npz), str(back),
                         "--reverse", "--like", str(src)])
    cc.main()

    ckpt = torch.load(back, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 7 and ckpt["performance"] == pytest.approx(52.3)

    fresh_gen = _ref_tepose()
    fresh_gen.load_state_dict(ckpt["gen_state_dict"])  # strict
    fresh_disc = _ref_disc(seed=1)
    fresh_disc.load_state_dict(ckpt["disc_motion_state_dict"])  # strict
    for key, val in model.state_dict().items():
        np.testing.assert_array_equal(
            fresh_gen.state_dict()[key].numpy(), val.numpy(), err_msg=key)
    for key, val in disc.state_dict().items():
        if key.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(
            fresh_disc.state_dict()[key].numpy(), val.numpy(), err_msg=key)

"""Ground-truth parity against the reference's OWN torch modules.

Unlike the other parity suites (which re-type the reference architecture
inside the test), these tests import the actual classes from /root/reference
via tests/reference_shims.py — `lib.models.tepose.TePose` (tepose.py:90),
`lib.models.vibe.VIBE` (vibe.py:66), `lib.models.spin.HMR/Regressor`
(spin.py:59,209), `lib.models.motion_discriminator_gcn.MotionDiscriminatorGCN`
(motion_discriminator_gcn.py:90) — seed them, convert their state_dicts with
the production converters, and assert our JAX stack reproduces their outputs.
A transcription error in either the implementation or the converters cannot
hide here: the torch side is the reference's source, byte for byte.
"""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import reference_shims as shims
from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import (
    TePoseConfig,
    VibeConfig,
    tepose_apply,
    vibe_apply,
)
from tepose_tpu.models.backbone import convert_torch_resnet50, resnet50_features
from tepose_tpu.models.regressor import regressor_apply
from tepose_tpu.models.gcn import motion_discriminator_apply
from tepose_tpu.train.checkpoint import (
    convert_torch_generator,
    convert_torch_discriminator,
)

NUM_VERTS = 300  # small synthetic SMPL keeps the torch LBS cheap


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    """Install shims, materialise the shared synthetic SMPL + base_data files,
    and chdir so the reference's relative `data/base_data` loads resolve."""
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


def _randomize_bn_stats(model: torch.nn.Module, seed: int = 0) -> None:
    """Give every BatchNorm non-trivial running stats so eval-mode parity
    actually exercises the converted statistics."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) * 0.8 + 0.6)


# ---------------------------------------------------------------------------
# TePose generator (ref: tepose.py:90-147)
# ---------------------------------------------------------------------------


def _make_ref_tepose(ref_env, n_layers=2, hidden=1024, seqlen=6):
    from lib.models.tepose import TePose

    torch.manual_seed(7)
    model = TePose(seqlen=seqlen, n_layers=n_layers, hidden_size=hidden,
                   pretrained="")  # no checkpoint file in the test env
    model.eval()
    return model


def test_tepose_eval_parity(ref_env):
    """Reference TePose eval forward vs our tepose_apply, flagship config."""
    model = _make_ref_tepose(ref_env)
    x = np.random.RandomState(0).randn(3, 6, 2133).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = model(torch.from_numpy(x), is_train=False, J_regressor=None)[-1]

    params = convert_torch_generator(model.state_dict())
    cfg = TePoseConfig(seqlen=6, n_layers=2, hidden_size=1024)
    out = tepose_apply(params, ref_env["smpl"], jnp.asarray(x), cfg)

    np.testing.assert_allclose(np.asarray(out["theta"]),
                               ref["theta"].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rotmat"]),
                               ref["rotmat"].numpy().reshape(3, 24, 3, 3),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["verts"]),
                               ref["verts"].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["kp_3d"]),
                               ref["kp_3d"].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["kp_2d"]),
                               ref["kp_2d"].numpy(), atol=2e-4)


def test_tepose_eval_parity_with_j_regressor(ref_env):
    """The H36M J_regressor eval path (ref: spin.py:275-278)."""
    model = _make_ref_tepose(ref_env)
    x = np.random.RandomState(1).randn(2, 6, 2133).astype(np.float32) * 0.2
    jreg = np.random.RandomState(2).rand(17, NUM_VERTS).astype(np.float32)
    jreg /= jreg.sum(axis=1, keepdims=True)
    with torch.no_grad():
        ref = model(torch.from_numpy(x), is_train=False,
                    J_regressor=torch.from_numpy(jreg))[-1]

    params = convert_torch_generator(model.state_dict())
    cfg = TePoseConfig(seqlen=6, n_layers=2, hidden_size=1024)
    out = tepose_apply(params, ref_env["smpl"], jnp.asarray(x), cfg,
                       j_regressor=jnp.asarray(jreg))

    assert out["kp_3d"].shape == (2, 14, 3)
    np.testing.assert_allclose(np.asarray(out["kp_3d"]),
                               ref["kp_3d"].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["kp_2d"]),
                               ref["kp_2d"].numpy(), atol=2e-4)


def test_tepose_train_branch_parity(ref_env):
    """is_train=True: fwd/rec branches as 2 repeats (ref: tepose.py:138-145).

    The torch module stays in eval() so Dropout is identity — this isolates
    the branch plumbing; train-mode dropout is pinned statistically in
    test_dropout_semantics_vs_reference.
    """
    model = _make_ref_tepose(ref_env)
    x = np.random.RandomState(3).randn(2, 6, 2133).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = model(torch.from_numpy(x), is_train=True, J_regressor=None)[-1]

    params = convert_torch_generator(model.state_dict())
    cfg = TePoseConfig(seqlen=6, n_layers=2, hidden_size=1024)
    out = tepose_apply(params, ref_env["smpl"], jnp.asarray(x), cfg,
                       train=True)  # no rng -> dropout off, same as torch eval

    assert out["theta"].shape == (2, 2, 85)
    np.testing.assert_allclose(np.asarray(out["theta"]),
                               ref["theta"].numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["rotmat"]),
        ref["rotmat"].numpy().reshape(2, 2, 24, 3, 3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["kp_3d"]),
                               ref["kp_3d"].numpy(), atol=2e-5)


def test_dropout_semantics_vs_reference(ref_env):
    """Train-mode dropout: our regressor must apply inverted dropout with the
    reference's rate (p=0.5) and placement (after fc1 and fc2; ref:
    spin.py:216-218,253-261). RNG streams differ, so pin the *distribution*:
    per-sample mean/std over many draws must match torch train mode."""
    import jax

    model = _make_ref_tepose(ref_env, n_layers=1, hidden=128)
    reg = model.regressor
    x = np.random.RandomState(4).randn(4, 2048).astype(np.float32) * 0.3

    n_draws = 64
    reg.train()
    torch.manual_seed(0)
    ref_draws = []
    with torch.no_grad():
        for _ in range(n_draws):
            ref_draws.append(
                reg(torch.from_numpy(x))[-1]["theta"].numpy())
    reg.eval()
    ref_draws = np.stack(ref_draws)

    params = convert_torch_generator(model.state_dict())["regressor"]
    smpl = ref_env["smpl"]
    our_draws = []
    for i in range(n_draws):
        out = regressor_apply(params, smpl, jnp.asarray(x), train=True,
                              rng=jax.random.PRNGKey(i))
        our_draws.append(np.asarray(out["theta"]))
    our_draws = np.stack(our_draws)

    # Dropout makes theta a random variable; equal rate+placement => equal
    # first/second moments (up to Monte-Carlo error).
    ref_mean, our_mean = ref_draws.mean(0), our_draws.mean(0)
    ref_std, our_std = ref_draws.std(0), our_draws.std(0)
    np.testing.assert_allclose(our_mean, ref_mean,
                               atol=4 * ref_std.max() / np.sqrt(n_draws) + 1e-4)
    assert np.abs(our_std.mean() - ref_std.mean()) < 0.25 * ref_std.mean()

    # and the spread is genuinely nonzero (dropout actually fires)
    assert our_std.max() > 1e-4 and ref_std.max() > 1e-4

    # eval mode must be exactly the dropout-off path
    with torch.no_grad():
        ref_eval = reg(torch.from_numpy(x))[-1]["theta"].numpy()
    out_eval = regressor_apply(params, smpl, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_eval["theta"]), ref_eval,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# VIBE (ref: vibe.py:66-117)
# ---------------------------------------------------------------------------


def test_vibe_parity(ref_env):
    from lib.models.vibe import VIBE

    torch.manual_seed(5)
    model = VIBE(seqlen=8, n_layers=2, hidden_size=1024, add_linear=True,
                 bidirectional=False, use_residual=True, pretrained="")
    model.eval()

    x = np.random.RandomState(5).randn(2, 8, 2048).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = model(torch.from_numpy(x), J_regressor=None)[-1]

    params = convert_torch_generator(model.state_dict(),
                                     has_vibe_encoder=True)
    cfg = VibeConfig(seqlen=8, n_layers=2, hidden_size=1024, add_linear=True)
    out = vibe_apply(params, ref_env["smpl"], jnp.asarray(x), cfg)

    assert out["theta"].shape == (2, 8, 85)
    np.testing.assert_allclose(np.asarray(out["theta"]),
                               ref["theta"].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["verts"]),
                               ref["verts"].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["kp_3d"]),
                               ref["kp_3d"].numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# HMR backbone + IEF head (ref: spin.py:59-206) — the VIBE_Demo feature path
# ---------------------------------------------------------------------------


def test_hmr_backbone_parity(ref_env):
    from lib.models.spin import HMR, Bottleneck

    torch.manual_seed(6)
    model = HMR(Bottleneck, [3, 4, 6, 3],
                os.path.join("data", "base_data", "smpl_mean_params.npz"))
    _randomize_bn_stats(model, seed=6)
    model.eval()

    x224 = np.random.RandomState(7).randn(1, 3, 224, 224).astype(
        np.float32) * 0.5
    with torch.no_grad():
        ref_feat = model.feature_extractor(torch.from_numpy(x224)).numpy()
        ref_out = model(torch.from_numpy(x224))[-1]

    backbone = convert_torch_resnet50(
        {k: v for k, v in model.state_dict().items()})
    feat = resnet50_features(backbone, jnp.asarray(x224))
    np.testing.assert_allclose(np.asarray(feat), ref_feat, atol=2e-4)

    # IEF head over the same features (HMR keys are un-prefixed; remap to the
    # generator layout the converter expects, ref: spin.py:77-108)
    sd = model.state_dict()
    gen_sd = {f"regressor.{k}": v for k, v in sd.items()
              if k.split(".")[0] in ("fc1", "fc2", "decpose", "decshape",
                                     "deccam", "init_pose", "init_shape",
                                     "init_cam")}
    params = convert_torch_generator(gen_sd)["regressor"]
    out = regressor_apply(params, ref_env["smpl"], jnp.asarray(ref_feat))
    np.testing.assert_allclose(np.asarray(out["theta"])[:, :3],
                               ref_out["theta"].numpy()[:, :3], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["theta"])[:, 3:],
                               ref_out["theta"].numpy()[:, 3:], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["verts"]),
                               ref_out["verts"].numpy(), atol=2e-4)


# ---------------------------------------------------------------------------
# MotionDiscriminatorGCN (ref: motion_discriminator_gcn.py:90-166)
# ---------------------------------------------------------------------------


def test_gcn_discriminator_parity(ref_env):
    from lib.models.motion_discriminator_gcn import MotionDiscriminatorGCN

    torch.manual_seed(8)
    model = MotionDiscriminatorGCN(
        num_class=2, num_point=24, num_person=1, num_gcn_scales=13,
        num_g3d_scales=6, graph="lib.graph.smplx_theta.AdjMatrixGraph")
    _randomize_bn_stats(model, seed=8)
    model.eval()

    x = np.random.RandomState(8).randn(3, 7, 72).astype(np.float32) * 0.4
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()

    params, state = convert_torch_discriminator(model.state_dict())
    out, _ = motion_discriminator_apply(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


# ---------------------------------------------------------------------------
# Geometry kernels vs lib/utils/geometry.py (the reference's own code)
# ---------------------------------------------------------------------------


def test_geometry_kernels_vs_reference(ref_env):
    import jax.numpy as jnp2

    from lib.utils import geometry as rg

    from tepose_tpu.ops.geometry import (
        batch_rodrigues, estimate_translation, rot6d_to_rotmat,
        rotmat_to_angle_axis)

    rs = np.random.RandomState(13)

    # axis-angle -> rotmat, incl. the +1e-8 quirk and near-zero angles
    aa = np.concatenate([rs.randn(32, 3).astype(np.float32) * 0.8,
                         np.zeros((2, 3), np.float32),
                         np.full((2, 3), 1e-7, np.float32)])
    ref_rm = rg.batch_rodrigues(torch.from_numpy(aa)).numpy().reshape(
        -1, 3, 3)
    our_rm = np.asarray(batch_rodrigues(
        jnp2.asarray(aa.reshape(-1, 1, 3)))).reshape(-1, 3, 3)
    np.testing.assert_allclose(our_rm, ref_rm, atol=1e-6)

    # rot6d -> rotmat
    x6 = rs.randn(40, 6).astype(np.float32)
    ref6 = rg.rot6d_to_rotmat(torch.from_numpy(x6.copy())).numpy()
    our6 = np.asarray(rot6d_to_rotmat(jnp2.asarray(x6)))
    np.testing.assert_allclose(our6, ref6, atol=1e-5)

    # rotmat -> axis-angle on valid rotations
    ref_aa = rg.rotation_matrix_to_angle_axis(
        torch.from_numpy(ref_rm)).numpy()
    our_aa = np.asarray(rotmat_to_angle_axis(jnp2.asarray(ref_rm)))
    np.testing.assert_allclose(our_aa, ref_aa, atol=1e-5)

    # weighted-least-squares camera translation
    S3 = rs.randn(3, 49, 3).astype(np.float32) * 0.3
    j2d = rs.randn(3, 49, 3).astype(np.float32)
    j2d[..., 2] = rs.rand(3, 49)
    ref_t = rg.estimate_translation(torch.from_numpy(S3),
                                    torch.from_numpy(j2d)).numpy()
    our_t = np.asarray(estimate_translation(S3, j2d))
    np.testing.assert_allclose(our_t, ref_t, atol=1e-4)


def test_vibe_bidirectional_parity(ref_env):
    """The bidirectional VIBE encoder variant (vibe.py:46-47: 2H -> 2048
    linear after a bidirectional GRU)."""
    from lib.models.vibe import VIBE

    torch.manual_seed(15)
    model = VIBE(seqlen=7, n_layers=2, hidden_size=512, add_linear=True,
                 bidirectional=True, use_residual=True, pretrained="")
    model.eval()

    x = np.random.RandomState(15).randn(2, 7, 2048).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = model(torch.from_numpy(x), J_regressor=None)[-1]

    from tepose_tpu.models.tepose import vibe_apply

    params = convert_torch_generator(model.state_dict(),
                                     has_vibe_encoder=True)
    cfg = VibeConfig(seqlen=7, n_layers=2, hidden_size=512, add_linear=True,
                     bidirectional=True)
    out = vibe_apply(params, ref_env["smpl"], jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(out["theta"]),
                               ref["theta"].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["kp_3d"]),
                               ref["kp_3d"].numpy(), atol=2e-5)

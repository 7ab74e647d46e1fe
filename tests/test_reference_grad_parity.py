"""GRADIENT parity against the reference's own torch modules.

Forward parity (the other test_reference_* suites) does not pin training:
a transposed weight in a linear layer, a wrong stop-gradient, or a
masked-mean reformulation that averages over the wrong denominator all
produce correct forwards with wrong gradients. These tests run torch
autograd through the reference's actual graph — TePose generator
(tepose.py:90) and TePoseLoss incl. the adversarial term through the real
MotionDiscriminatorGCN (loss.py:59-171) — and compare input gradients
against `jax.grad` of our stack on identical weights/inputs. Input
gradients (not parameter gradients) make the comparison converter-free:
same shapes on both sides, while still exercising every parameter's
backward contribution.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import reference_shims as shims
from tepose_tpu.models.gcn import motion_discriminator_apply
from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import TePoseConfig, tepose_apply
from tepose_tpu.train.checkpoint import (
    convert_torch_discriminator,
    convert_torch_generator,
)
from tepose_tpu.train.loss import LossWeights, tepose_loss

NUM_VERTS = 300
S = 6


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    shims.install_reference()
    root = tmp_path_factory.mktemp("refdata_grad")
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


def test_generator_input_gradient_matches_reference(ref_env):
    """d(scalar readout of theta/kp_3d/kp_2d)/d(input window) through the
    whole generator: GRU encoder -> IEF -> rot6d -> SMPL LBS -> projection."""
    from lib.models.tepose import TePose

    torch.manual_seed(7)
    model = TePose(seqlen=S, n_layers=2, hidden_size=1024, pretrained="")
    model.eval()

    rs = np.random.RandomState(0)
    x = rs.randn(2, S, 2133).astype(np.float32) * 0.2
    w_th = rs.randn(85).astype(np.float32)
    w_j3 = rs.randn(49, 3).astype(np.float32)
    w_j2 = rs.randn(49, 2).astype(np.float32)

    xt = torch.from_numpy(x.copy()).requires_grad_(True)
    out = model(xt, is_train=False, J_regressor=None)[-1]
    scalar = ((out["theta"] * torch.from_numpy(w_th)).sum()
              + (out["kp_3d"] * torch.from_numpy(w_j3)).sum()
              + (out["kp_2d"] * torch.from_numpy(w_j2)).sum())
    scalar.backward()
    ref_grad = xt.grad.numpy()

    params = convert_torch_generator(model.state_dict())
    cfg = TePoseConfig(seqlen=S, n_layers=2, hidden_size=1024)
    smpl = ref_env["smpl"]

    def readout(xj):
        o = tepose_apply(params, smpl, xj, cfg)
        return ((o["theta"] * w_th).sum() + (o["kp_3d"] * w_j3).sum()
                + (o["kp_2d"] * w_j2).sum())

    our_grad = np.asarray(jax.grad(readout)(jnp.asarray(x)))

    scale = np.abs(ref_grad).max()
    np.testing.assert_allclose(our_grad, ref_grad, atol=2e-4 * scale)


def test_loss_gradient_matches_reference(ref_env):
    """d(gen_loss)/d(predictions) through the reference's TePoseLoss with
    the real GCN discriminator (adversarial encoder term included) vs
    jax.grad of our masked-mean tepose_loss: pins that the boolean-filter ->
    masked-mean reformulation has identical gradients, not just values."""
    from lib.core.loss import TePoseLoss
    from lib.models.motion_discriminator_gcn import MotionDiscriminatorGCN

    rs = np.random.RandomState(1)
    n_2d, n_3d = 2, 3
    B = n_2d + n_3d

    torch.manual_seed(9)
    disc = MotionDiscriminatorGCN(
        num_class=2, num_point=24, num_person=1, num_gcn_scales=13,
        num_g3d_scales=6, graph="lib.graph.smplx_theta.AdjMatrixGraph")
    disc.eval()

    preds = {
        "theta": rs.randn(B, 2, 85).astype(np.float32) * 0.3,
        "kp_2d": rs.randn(B, 2, 49, 2).astype(np.float32),
        "kp_3d": rs.randn(B, 2, 49, 3).astype(np.float32),
    }
    kp_2d_gt = rs.randn(B, 2, 49, 3).astype(np.float32)
    kp_2d_gt[..., 2] = rs.rand(B, 2, 49)
    kp_3d_gt = rs.randn(n_3d, 2, 49, 3).astype(np.float32)
    theta_gt = rs.randn(n_3d, 2, 85).astype(np.float32) * 0.3
    w_3d = np.array([1, 0, 1], np.float32)
    w_smpl = np.array([1, 0, 1], np.float32)
    prev_thetas = rs.randn(B, S - 1, 85).astype(np.float32) * 0.3
    real_motion = rs.randn(B, S, 85).astype(np.float32) * 0.3

    # ---- torch side: grads w.r.t. the three prediction tensors ----------
    t = torch.from_numpy
    ref_loss = TePoseLoss(e_loss_weight=60., e_3d_loss_weight=30.,
                          e_pose_loss_weight=1., e_shape_loss_weight=0.001,
                          d_motion_loss_weight=1., device="cpu")
    tp = {k: t(v.copy()).requires_grad_(True) for k, v in preds.items()}
    gen_out = [{"theta": tp["theta"], "kp_2d": tp["kp_2d"],
                "kp_3d": tp["kp_3d"]}]
    data_2d = {"kp_2d": t(kp_2d_gt[:n_2d])}
    data_3d = {
        "kp_2d": t(kp_2d_gt[n_2d:]),
        "kp_3d": t(kp_3d_gt),
        "theta": t(theta_gt),
        "w_3d": t(np.repeat(w_3d[:, None], 2, axis=1)),
        "w_smpl": t(np.repeat(w_smpl[:, None], 2, axis=1)),
    }
    ref_gen, _, _ = ref_loss(
        gen_out, data_2d, data_3d, pre_mosh=t(prev_thetas),
        data_motion_mosh={"theta": t(real_motion)},
        motion_discriminator=disc)
    ref_gen.backward()
    ref_grads = {k: tp[k].grad.numpy() for k in tp}

    # ---- jax side --------------------------------------------------------
    params, state = convert_torch_discriminator(disc.state_dict())

    def disc_fn(xj, mask):
        out, _ = motion_discriminator_apply(params, state, xj)
        return out

    def gen_loss_of(preds_j):
        gen, _, _ = tepose_loss(
            preds_j,
            kp_2d_gt=jnp.asarray(kp_2d_gt),
            kp_3d_gt=jnp.asarray(kp_3d_gt),
            theta_gt=jnp.asarray(theta_gt),
            w_3d=jnp.asarray(w_3d),
            w_smpl=jnp.asarray(w_smpl),
            valid=jnp.ones((B,)),
            n_2d=n_2d,
            prev_thetas=jnp.asarray(prev_thetas),
            real_motion=jnp.asarray(real_motion),
            disc_fn=disc_fn,
            weights=LossWeights(kp_2d=60.0, kp_3d=30.0, pose=1.0,
                                shape=0.001, d_motion=1.0))
        return gen

    our_grads = jax.grad(gen_loss_of)(
        {k: jnp.asarray(v) for k, v in preds.items()})

    for k in ref_grads:
        scale = max(np.abs(ref_grads[k]).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(our_grads[k]), ref_grads[k],
                                   atol=2e-4 * scale, err_msg=k)

"""Golden full-model test: a torch generator with the reference's exact
architecture (2-layer GRU-1024 dual encoder + 3-iter IEF), random weights,
fixed input window -> convert weights -> our full tepose_apply must reproduce
the torch pose/shape/cam and the downstream rotmat/theta outputs.

This chains converter + GRU + encoder fusion + IEF + rot6d + rotmat->aa in
one pass (SURVEY.md §4(b) golden-file parity, with the torch side generated
in-test instead of recorded files)."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import TePoseConfig, tepose_apply
from tepose_tpu.train.checkpoint import convert_torch_generator
from tepose_tpu.ops.geometry import rot6d_to_rotmat


class TorchGenerator(nn.Module):
    """Reference-architecture generator (encoder + IEF, no SMPL)."""

    def __init__(self, n_layers=2, hidden=1024):
        super().__init__()

        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.gru_fwd = nn.GRU(2133, hidden, num_layers=n_layers)
                self.gru_rec = nn.GRU(2133, hidden, num_layers=n_layers,
                                      bidirectional=True)
                self.linear_fwd = nn.Linear(hidden, 2048)
                self.linear_rec = nn.Linear(hidden * 2, 2048)

        class Reg(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(2048 + 144 + 13, 1024)
                self.fc2 = nn.Linear(1024, 1024)
                self.decpose = nn.Linear(1024, 144)
                self.decshape = nn.Linear(1024, 10)
                self.deccam = nn.Linear(1024, 3)
                self.register_buffer("init_pose", torch.randn(1, 144) * 0.1)
                self.register_buffer("init_shape", torch.randn(1, 10) * 0.1)
                self.register_buffer("init_cam",
                                     torch.tensor([[0.9, 0.0, 0.0]]))

        self.encoder = Enc()
        self.regressor = Reg()

    def forward(self, x):
        # encoder (ref: tepose.py:71-87, eval branch)
        y, _ = self.encoder.gru_fwd(x.permute(1, 0, 2))
        y_fwd = self.encoder.linear_fwd(torch.relu(y[-1]))
        y_rec, _ = self.encoder.gru_rec(
            torch.flip(x, dims=[1]).permute(1, 0, 2))
        y_rec = self.encoder.linear_rec(torch.relu(y_rec[0]))
        feat = (y_fwd + y_rec) / 2

        # IEF (ref: spin.py:253-261, eval: dropout identity)
        r = self.regressor
        B = feat.shape[0]
        pose = r.init_pose.expand(B, -1)
        shape = r.init_shape.expand(B, -1)
        cam = r.init_cam.expand(B, -1)
        for _ in range(3):
            xc = torch.cat([feat, pose, shape, cam], 1)
            xc = r.fc2(r.fc1(xc))
            pose = r.decpose(xc) + pose
            shape = r.decshape(xc) + shape
            cam = r.deccam(xc) + cam
        return pose, shape, cam


def test_full_generator_golden(rng):
    torch.manual_seed(0)
    gen_t = TorchGenerator(n_layers=2, hidden=64)
    gen_t.eval()

    x = rng.randn(2, 6, 2133).astype(np.float32) * 0.2
    with torch.no_grad():
        pose_t, shape_t, cam_t = gen_t(torch.from_numpy(x))

    # convert and run ours end to end (incl. SMPL + theta assembly)
    params = convert_torch_generator(gen_t.state_dict())
    smpl = synthetic_smpl_model(seed=0, num_verts=96)
    cfg = TePoseConfig(seqlen=6, n_layers=2, hidden_size=64)
    out = tepose_apply(params, smpl, jnp.asarray(x), cfg)

    # theta = [cam, aa-pose, shape]; compare cam/shape directly
    theta = np.asarray(out["theta"])
    np.testing.assert_allclose(theta[:, :3], cam_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(theta[:, 75:], shape_t.numpy(), atol=1e-4)

    # rotmat must equal rot6d(pose_t)
    rm_ref = np.asarray(rot6d_to_rotmat(
        jnp.asarray(pose_t.numpy().reshape(-1, 6)))).reshape(2, 24, 3, 3)
    np.testing.assert_allclose(np.asarray(out["rotmat"]), rm_ref, atol=1e-4)

    # and with the fast encoder the same checkpoint gives the same answer
    import dataclasses

    cfg_fast = dataclasses.replace(cfg, fast_encoder=True)
    out_fast = tepose_apply(params, smpl, jnp.asarray(x), cfg_fast)
    np.testing.assert_allclose(np.asarray(out_fast["theta"]), theta,
                               atol=2e-4)


def test_dryrun_multichip_pytest():
    """The driver's multi-chip dry run must pass on the 8-device CPU mesh."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)

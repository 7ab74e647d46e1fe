"""End-to-end discriminator checkpoint conversion parity: a torch
MotionDiscriminatorGCN with the reference's exact module tree, random
weights -> convert_torch_discriminator -> our forward must match."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from tepose_tpu.models.gcn import motion_discriminator_apply
from tepose_tpu.models.graph import (
    multi_scale_adjacency, smpl_graph_binary, spatial_temporal_adjacency)
from tepose_tpu.train.checkpoint import convert_torch_discriminator

GCN_SCALES, G3D_SCALES, WINDOW = 13, 6, 3


class TorchMLP(nn.Module):
    def __init__(self, in_ch, out_ch, act="relu"):
        super().__init__()
        self.layers = nn.ModuleList([
            nn.Conv2d(in_ch, out_ch, 1), nn.BatchNorm2d(out_ch)])
        self.act = act

    def forward(self, x):
        x = self.layers[1](self.layers[0](x))
        return torch.relu(x) if self.act == "relu" else x


class TorchMSGCN(nn.Module):
    def __init__(self, num_scales, in_ch, out_ch, A_binary):
        super().__init__()
        self.num_scales = num_scales
        A = multi_scale_adjacency(A_binary, num_scales)
        self.register_buffer("A_powers", torch.from_numpy(A))
        self.A_res = nn.Parameter(
            torch.empty(A.shape).uniform_(-1e-6, 1e-6))
        self.mlp = TorchMLP(in_ch * num_scales, out_ch)

    def forward(self, x):
        N, C, T, V = x.shape
        A = self.A_powers + self.A_res
        s = torch.einsum("vu,nctu->nctv", A, x)
        s = s.view(N, C, T, self.num_scales, V).permute(0, 3, 1, 2, 4)
        return self.mlp(s.reshape(N, self.num_scales * C, T, V))


class TorchSTMSGCN(nn.Module):
    def __init__(self, in_ch, out_ch, A_binary, num_scales, window):
        super().__init__()
        self.num_scales = num_scales
        A_large = spatial_temporal_adjacency(A_binary, window)
        A = multi_scale_adjacency(A_large, num_scales)
        self.register_buffer("A_scales", torch.from_numpy(A))
        self.A_res = nn.Parameter(
            torch.empty(A.shape).uniform_(-1e-6, 1e-6))
        self.mlp = TorchMLP(in_ch * num_scales, out_ch, act="linear")

    def forward(self, x):
        N, C, T, V = x.shape
        A = self.A_scales + self.A_res
        s = torch.einsum("vu,nctu->nctv", A, x)
        s = s.view(N, C, T, self.num_scales, V).permute(0, 3, 1, 2, 4)
        return torch.relu(self.mlp(s.reshape(N, self.num_scales * C, T, V)))


class TorchMSG3D(nn.Module):
    def __init__(self, in_ch, out_ch, A_binary, num_scales, window=WINDOW):
        super().__init__()
        self.window_size = window
        embed_out = out_ch if in_ch == 3 else in_ch
        self.embed_out = embed_out
        pad = (window - 1) // 2
        self.unfold = nn.Unfold(kernel_size=(window, 1), padding=(pad, 0))
        # mirror the reference's Sequential index layout: gcn3d.1 = ST-GCN
        self.gcn3d = nn.ModuleList([nn.Identity(),
                                    TorchSTMSGCN(in_ch, embed_out, A_binary,
                                                 num_scales, window)])
        self.out_conv = nn.Conv3d(embed_out, out_ch,
                                  kernel_size=(1, window, 1))
        self.out_bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        N, C, T, V = x.shape
        u = self.unfold(x)
        u = u.view(N, C, self.window_size, -1, V).permute(0, 1, 3, 2, 4)
        u = u.reshape(N, C, -1, self.window_size * V)
        y = self.gcn3d[1](u)
        y = y.view(N, self.embed_out, -1, self.window_size, V)
        y = self.out_conv(y).squeeze(3)
        return self.out_bn(y)


class TorchTemporalConv(nn.Module):
    def __init__(self, in_ch, out_ch, k=1):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, kernel_size=(k, 1),
                              padding=((k - 1) // 2, 0))
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return self.bn(self.conv(x))


class TorchMotionDisc(nn.Module):
    def __init__(self, num_class=2, num_point=24, in_channels=3):
        super().__init__()
        self.num_point = num_point
        self.in_channels = in_channels
        A = smpl_graph_binary()
        c1, c2, c3 = 64, 128, 256
        self.data_bn = nn.BatchNorm1d(num_point * in_channels)
        dims = [(in_channels, c1), (c1, c2), (c2, c3)]
        for i, (ci, co) in enumerate(dims, start=1):
            setattr(self, f"gcn3d{i}", TorchMSG3D(ci, co, A, G3D_SCALES))
            setattr(self, f"sgcn{i}", TorchMSGCN(GCN_SCALES, ci, co, A))
            setattr(self, f"residual_{i}", TorchTemporalConv(ci, co))
        self.fc = nn.Linear(c3, num_class)

    def forward(self, x):
        N, T, _ = x.shape
        x = self.data_bn(x.permute(0, 2, 1).contiguous())
        x = x.view(N, self.num_point, self.in_channels, T).permute(
            0, 2, 3, 1).contiguous()
        for i in (1, 2, 3):
            res = getattr(self, f"residual_{i}")(x)
            x = torch.relu(getattr(self, f"sgcn{i}")(x)
                           + getattr(self, f"gcn3d{i}")(x))
            x = torch.relu(x + res)
        out = x.reshape(N, x.shape[1], -1).mean(2)
        return torch.softmax(self.fc(out), dim=1)[:, 0]


def test_disc_conversion_matches_torch(rng):
    torch.manual_seed(0)
    disc = TorchMotionDisc()
    # randomize BN stats so the conversion of running stats is exercised
    for m in disc.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            m.running_mean.uniform_(-0.1, 0.1)
            m.running_var.uniform_(0.8, 1.2)
    disc.eval()

    x = rng.randn(4, 6, 72).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = disc(torch.from_numpy(x)).numpy()

    params, state = convert_torch_discriminator(disc.state_dict())
    ours, _ = motion_discriminator_apply(
        params, state, jnp.asarray(x), num_gcn_scales=GCN_SCALES,
        num_g3d_scales=G3D_SCALES, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)

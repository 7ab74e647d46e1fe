"""Checkpoint flatten/unflatten roundtrip and torch-state_dict conversion."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from tepose_tpu.models.temporal import temporal_encoder_apply
from tepose_tpu.models.regressor import ief_iterations
from tepose_tpu.train.checkpoint import (
    convert_torch_generator, flatten_tree, load_checkpoint, save_checkpoint,
    unflatten_tree)


def test_flatten_roundtrip(rng):
    tree = {
        "a": {"b": rng.randn(3, 4).astype(np.float32),
              "layers": [{"w": rng.randn(2).astype(np.float32)},
                         {"w": rng.randn(2).astype(np.float32)}]},
        "c": rng.randn(5).astype(np.float32),
    }
    flat = flatten_tree(tree)
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    assert isinstance(back["a"]["layers"], list)
    np.testing.assert_array_equal(back["a"]["layers"][1]["w"],
                                  tree["a"]["layers"][1]["w"])


def test_save_load_checkpoint(tmp_path, rng):
    trees = {"gen": {"w": rng.randn(4, 4).astype(np.float32)},
             "opt": {"mu": {"w": rng.randn(4, 4).astype(np.float32)}}}
    path = str(tmp_path / "checkpoint.npz")
    save_checkpoint(path, trees, {"epoch": 3, "performance": 52.3})
    loaded, scalars = load_checkpoint(path)
    np.testing.assert_array_equal(loaded["gen"]["w"], trees["gen"]["w"])
    np.testing.assert_array_equal(loaded["opt"]["mu"]["w"],
                                  trees["opt"]["mu"]["w"])
    assert scalars["epoch"] == 3
    assert scalars["performance"] == 52.3


def _torch_tepose_generator(n_layers=1, hidden=32, in_dim=100):
    """A torch module tree with the reference's state_dict key layout."""
    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.gru_fwd = nn.GRU(in_dim, hidden, num_layers=n_layers)
            self.gru_rec = nn.GRU(in_dim, hidden, num_layers=n_layers,
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
            self.register_buffer("init_pose", torch.randn(1, 144))
            self.register_buffer("init_shape", torch.randn(1, 10))
            self.register_buffer("init_cam", torch.randn(1, 3))

    class Gen(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Enc()
            self.regressor = Reg()

    torch.manual_seed(0)
    return Gen()


def test_convert_torch_generator_matches_forward(rng):
    """Converted params must reproduce the torch modules' outputs."""
    n_layers, hidden, in_dim = 1, 32, 100
    gen = _torch_tepose_generator(n_layers, hidden, in_dim)
    params = convert_torch_generator(gen.state_dict())

    # encoder forward parity
    x = rng.randn(2, 6, in_dim).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x)
        y, _ = gen.encoder.gru_fwd(xt.permute(1, 0, 2))
        y_fwd = gen.encoder.linear_fwd(torch.relu(y[-1]))
        y_rec, _ = gen.encoder.gru_rec(
            torch.flip(xt, dims=[1]).permute(1, 0, 2))
        y_rec = gen.encoder.linear_rec(torch.relu(y_rec[0]))
        ref_enc = ((y_fwd + y_rec) / 2).numpy()
    ours_enc = np.asarray(temporal_encoder_apply(
        params["encoder"], jnp.asarray(x), n_layers))
    np.testing.assert_allclose(ours_enc, ref_enc, atol=2e-5)

    # IEF parity through converted regressor params
    feat = rng.randn(3, 2048).astype(np.float32)
    with torch.no_grad():
        r = gen.regressor
        pose = r.init_pose.expand(3, -1)
        shape = r.init_shape.expand(3, -1)
        cam = r.init_cam.expand(3, -1)
        ft = torch.from_numpy(feat)
        for _ in range(3):
            xc = torch.cat([ft, pose, shape, cam], 1)
            xc = r.fc2(r.fc1(xc))
            pose = r.decpose(xc) + pose
            shape = r.decshape(xc) + shape
            cam = r.deccam(xc) + cam
    p, s, c = ief_iterations(params["regressor"], jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(p), pose.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(s), shape.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(c), cam.numpy(), atol=3e-5)


def test_convert_vibe_generator(rng):
    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.gru = nn.GRU(2048, 32, num_layers=2)
            self.linear = nn.Linear(32, 2048)

    class Gen(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Enc()

    gen = Gen()
    params = convert_torch_generator(gen.state_dict())
    assert "gru" in params["encoder"]
    assert "linear" in params["encoder"]
    assert params["encoder"]["gru"]["weight_ih_l0"].shape == (96, 2048)

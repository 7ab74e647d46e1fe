"""Import the reference's *own* torch modules for ground-truth parity tests.

The reference at /root/reference depends on three packages absent from this
environment: `yacs` (config), `torchvision` (only used by the pretrained-HMR
ctor path), and `smplx` (the SMPL body model). This module installs minimal
shims for the first two and a from-scratch torch LBS implementation for the
third, then puts /root/reference on sys.path so tests can run e.g.
`lib.models.tepose.TePose` (tepose.py:90) directly against our JAX stack.

The smplx shim is NOT a copy of smplx: it is an independent torch
implementation of standard SMPL linear-blend skinning driven by the same
synthetic model .npz our JAX `SmplModel` loads, so the reference graph runs
end-to-end (encoder -> IEF -> SMPL -> projection) with identical model data.

Data files the reference loads lazily with *relative* paths
(`data/base_data/J_regressor_extra.npy`, `smpl_mean_params.npz`; ref:
lib/models/smpl.py:54-56) are materialised by `make_base_data` and picked up
via chdir in the test fixture.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"

# Module-level handle the smplx shim reads to find the SMPL model tensors.
_MODEL_NPZ_PATH = {"path": None}


# ---------------------------------------------------------------------------
# yacs shim (only what lib/core/config.py uses at import time)
# ---------------------------------------------------------------------------


class _CfgNode(dict):
    """Tiny stand-in for yacs.config.CfgNode: attribute-style nested dict."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def clone(self):
        import copy

        return copy.deepcopy(self)

    def merge_from_file(self, path):
        import yaml

        with open(path) as f:
            loaded = yaml.safe_load(f) or {}

        def merge(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and isinstance(dst.get(k), dict):
                    merge(dst[k], v)
                else:
                    dst[k] = v

        merge(self, loaded)

    def freeze(self):
        pass

    def defrost(self):
        pass


def _install_yacs():
    if "yacs" in sys.modules:
        return
    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = _CfgNode
    yacs.config = yacs_config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = yacs_config


# ---------------------------------------------------------------------------
# torchvision shim (spin.py imports it at module level; resnet50 is only
# called by hmr(pretrained=True), which these tests never use)
# ---------------------------------------------------------------------------


def _install_torchvision():
    if "torchvision" in sys.modules:
        return

    def resnet50(*a, **k):
        raise RuntimeError(
            "torchvision shim: pretrained resnet50 unavailable in tests")

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_resnet = types.ModuleType("torchvision.models.resnet")
    tv_resnet.resnet50 = resnet50
    tv_models.resnet = tv_resnet
    tv.models = tv_models

    # transforms: the three callables _img_utils.py:322-330 composes.
    # Standard semantics (ToTensor: HWC u8 -> CHW f32/255; Normalize:
    # per-channel (x-mean)/std), implemented fresh.
    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class ToTensor:
        def __call__(self, x):
            x = np.asarray(x)
            if x.dtype == np.uint8:
                x = x.astype(np.float32) / 255.0
            return torch.from_numpy(x.transpose(2, 0, 1)).float()

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, x):
            return (x - self.mean) / self.std

    tv_transforms = types.ModuleType("torchvision.transforms")
    tv_transforms.Compose = Compose
    tv_transforms.ToTensor = ToTensor
    tv_transforms.Normalize = Normalize
    tv.transforms = tv_transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.models.resnet"] = tv_resnet
    sys.modules["torchvision.transforms"] = tv_transforms


# ---------------------------------------------------------------------------
# skimage shim: _img_utils.py imports view_as_windows at module level. Fresh
# implementation of the public API via numpy's sliding_window_view.
# ---------------------------------------------------------------------------


def _install_skimage():
    if "skimage" in sys.modules:
        return

    def view_as_windows(arr_in, window_shape, step=1):
        arr_in = np.asarray(arr_in)
        if np.isscalar(window_shape):
            window_shape = (window_shape,) * arr_in.ndim
        window_shape = tuple(int(w) for w in window_shape)
        if np.isscalar(step):
            step = (step,) * arr_in.ndim
        step = tuple(int(s) for s in step)
        view = np.lib.stride_tricks.sliding_window_view(arr_in, window_shape)
        return view[tuple(slice(None, None, s) for s in step)]

    sk = types.ModuleType("skimage")
    sk.__path__ = []  # mark as package: _occ_utils.py:12 imports skimage.data
    sk_util = types.ModuleType("skimage.util")
    sk_shape = types.ModuleType("skimage.util.shape")
    sk_shape.view_as_windows = view_as_windows
    sk_util.shape = sk_shape
    sk.util = sk_util
    sk_data = types.ModuleType("skimage.data")
    # only used by _occ_utils' interactive demo path; any image works
    sk_data.astronaut = lambda: np.zeros((512, 512, 3), np.uint8)
    sk.data = sk_data
    sys.modules["skimage"] = sk
    sys.modules["skimage.util"] = sk_util
    sys.modules["skimage.util.shape"] = sk_shape
    sys.modules["skimage.data"] = sk_data


# ---------------------------------------------------------------------------
# smplx shim: independent torch LBS over our converted-model npz layout
# ---------------------------------------------------------------------------


class SMPLOutput:
    """Field-compatible with smplx.body_models.SMPLOutput (the attributes the
    reference touches: vertices, joints, betas, global_orient, body_pose,
    full_pose; ref: lib/models/smpl.py:78-83)."""

    def __init__(self, vertices=None, joints=None, betas=None,
                 global_orient=None, body_pose=None, full_pose=None):
        self.vertices = vertices
        self.joints = joints
        self.betas = betas
        self.global_orient = global_orient
        self.body_pose = body_pose
        self.full_pose = full_pose


def vertices2joints(J_regressor, vertices):
    return torch.einsum("bik,ji->bjk", vertices, J_regressor)


def _torch_rodrigues(aa):
    """(N, 3) axis-angle -> (N, 3, 3) rotation matrices (quaternion route,
    written against the standard formula — independent of both the reference
    and our JAX batch_rodrigues)."""
    angle = torch.linalg.norm(aa + 1e-8, dim=1, keepdim=True)
    axis = aa / angle
    half = angle * 0.5
    w = torch.cos(half)
    xyz = axis * torch.sin(half)
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    w = w[:, 0]
    return torch.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], dim=1).reshape(-1, 3, 3)


class _TorchSMPL(nn.Module):
    """Drop-in for smplx.SMPL as the reference subclasses it.

    Loads the model npz written by `save_model_npz` (same tensors our JAX
    `load_smpl_assets` consumes) and runs standard LBS in torch float32.
    Output joints follow the smplx convention the reference indexes into:
    24 posed skeleton joints + 21 surface-vertex keypoints = 45.
    """

    def __init__(self, model_path=None, batch_size=1, create_transl=False,
                 **kwargs):
        super().__init__()
        npz = _MODEL_NPZ_PATH["path"]
        if npz is None:
            raise RuntimeError(
                "smplx shim: call reference_shims.set_model_npz(path) first")
        with np.load(npz) as z:
            self.register_buffer(
                "v_template", torch.tensor(z["v_template"], dtype=torch.float32))
            self.register_buffer(
                "shapedirs",
                torch.tensor(z["shapedirs"][..., :10], dtype=torch.float32))
            # our layout: (207, V*3)
            self.register_buffer(
                "posedirs", torch.tensor(z["posedirs"], dtype=torch.float32))
            self.register_buffer(
                "J_regressor",
                torch.tensor(z["j_regressor"], dtype=torch.float32))
            self.register_buffer(
                "lbs_weights",
                torch.tensor(z["lbs_weights"], dtype=torch.float32))
            self.parents = np.asarray(z["parents"]).astype(int)
            self.vertex_joint_ids = torch.tensor(
                np.asarray(z["vertex_joint_ids"]), dtype=torch.long)
            self.faces = (np.asarray(z["faces"])
                          if "faces" in z else np.zeros((0, 3), np.int32))

    def forward(self, betas=None, body_pose=None, global_orient=None,
                pose2rot=True, **kwargs):
        if pose2rot:
            full_aa = torch.cat([global_orient, body_pose], dim=1)
            B = full_aa.shape[0]
            rot = _torch_rodrigues(full_aa.reshape(-1, 3)).reshape(B, 24, 3, 3)
        else:
            rot = torch.cat([global_orient, body_pose], dim=1)  # (B, 24, 3, 3)
            B = rot.shape[0]

        v_shaped = self.v_template + torch.einsum(
            "bl,vkl->bvk", betas, self.shapedirs)
        joints_rest = torch.einsum("jv,bvk->bjk", self.J_regressor, v_shaped)

        ident = torch.eye(3, dtype=rot.dtype)
        pose_feature = (rot[:, 1:] - ident).reshape(B, -1)
        v_posed = v_shaped + (pose_feature @ self.posedirs).reshape(B, -1, 3)

        # kinematic chain
        J = joints_rest.shape[1]
        rel_joints = joints_rest.clone()
        rel_joints[:, 1:] -= joints_rest[:, self.parents[1:]]
        local = torch.zeros(B, J, 4, 4, dtype=rot.dtype)
        local[:, :, :3, :3] = rot
        local[:, :, :3, 3] = rel_joints
        local[:, :, 3, 3] = 1.0
        chain = [local[:, 0]]
        for i in range(1, J):
            chain.append(chain[self.parents[i]] @ local[:, i])
        global_tf = torch.stack(chain, dim=1)
        posed_joints = global_tf[:, :, :3, 3]

        joints_h = torch.cat(
            [joints_rest, torch.zeros(B, J, 1, dtype=rot.dtype)], dim=-1)
        correction = torch.einsum("bjik,bjk->bji", global_tf, joints_h)
        rel_tf = global_tf.clone()
        rel_tf[:, :, :3, 3] -= correction[:, :, :3]

        T = torch.einsum("vj,bjik->bvik", self.lbs_weights, rel_tf)
        verts = (torch.einsum("bvik,bvk->bvi", T[:, :, :3, :3], v_posed)
                 + T[:, :, :3, 3])

        joints45 = torch.cat(
            [posed_joints, verts[:, self.vertex_joint_ids]], dim=1)
        return SMPLOutput(vertices=verts, joints=joints45, betas=betas,
                          global_orient=global_orient, body_pose=body_pose,
                          full_pose=None)


def _install_smplx():
    if "smplx" in sys.modules:
        return
    smplx = types.ModuleType("smplx")
    smplx_bm = types.ModuleType("smplx.body_models")
    smplx_lbs = types.ModuleType("smplx.lbs")
    smplx.SMPL = _TorchSMPL
    smplx_bm.SMPLOutput = SMPLOutput
    smplx_lbs.vertices2joints = vertices2joints
    smplx.body_models = smplx_bm
    smplx.lbs = smplx_lbs
    sys.modules["smplx"] = smplx
    sys.modules["smplx.body_models"] = smplx_bm
    sys.modules["smplx.lbs"] = smplx_lbs


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def set_model_npz(path: str) -> None:
    _MODEL_NPZ_PATH["path"] = str(path)


def save_model_npz(model, path: str) -> str:
    """Serialise a tepose_tpu SmplModel pytree to the converted-npz layout
    (tools/convert_smpl.py keys + vertex_joint_ids/j_regressor_extra)."""
    np.savez(
        path,
        v_template=np.asarray(model.v_template),
        shapedirs=np.asarray(model.shapedirs),
        posedirs=np.asarray(model.posedirs),
        j_regressor=np.asarray(model.j_regressor),
        lbs_weights=np.asarray(model.lbs_weights),
        parents=np.asarray(model.parents, np.int32),
        j_regressor_extra=np.asarray(model.j_regressor_extra),
        vertex_joint_ids=np.asarray(model.vertex_joint_ids, np.int32),
        faces=np.zeros((0, 3), np.int32),
    )
    return str(path)


def make_base_data(root: str, model, mean_params: dict) -> None:
    """Write data/base_data/{J_regressor_extra.npy, smpl_mean_params.npz}
    under `root` so the reference's relative BASE_DATA_DIR loads resolve
    (ref: lib/models/smpl.py:54-56, spin.py:232)."""
    base = os.path.join(root, "data", "base_data")
    os.makedirs(base, exist_ok=True)
    np.save(os.path.join(base, "J_regressor_extra.npy"),
            np.asarray(model.j_regressor_extra, np.float32))
    np.savez(os.path.join(base, "smpl_mean_params.npz"),
             pose=np.asarray(mean_params["pose"], np.float32),
             shape=np.asarray(mean_params["shape"], np.float32),
             cam=np.asarray(mean_params["cam"], np.float32))


def _install_pytube():
    """demo_utils.py:9 imports `from pytube import YouTube` at module level;
    the download path is never exercised in tests."""
    if "pytube" in sys.modules:
        return
    pt = types.ModuleType("pytube")

    class YouTube:
        def __init__(self, *a, **k):
            raise RuntimeError("pytube shim: no network in tests")

    pt.YouTube = YouTube
    sys.modules["pytube"] = pt


def install_reference() -> None:
    """Install shims and make `import lib...` resolve to /root/reference."""
    _install_yacs()
    _install_torchvision()
    _install_skimage()
    _install_pytube()
    _install_smplx()
    # the reference uses the numpy<1.24 `np.float` alias
    # (dataset_3d.py:287, dataset_2d.py:156)
    if not hasattr(np, "float"):
        np.float = float
    if REFERENCE_ROOT not in sys.path:
        # APPEND, not insert: the reference root also contains top-level
        # demo.py/train.py/evaluate.py which would otherwise shadow the
        # repo's own CLI modules for any test running after a parity test.
        # Only the unique `lib` package needs to resolve from there.
        sys.path.append(REFERENCE_ROOT)

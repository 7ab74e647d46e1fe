"""Checkpoint save/resume + released-PyTorch-checkpoint conversion.

ref: lib/core/trainer.py:392-435 (save_model/resume: epoch, generator and
discriminator params, both optimiser states, lr-scheduler state, best
performance; `checkpoint.npz` every epoch and `model_best.npz` on
improvement) and SURVEY.md §5 (PyTorch->JAX converter for the released
`.pth.tar` files, incl. GRU gate order and BN stats).

Format: a single `.npz` of the flattened pytree ("a/b/c" keys) + a JSON
sidecar of scalars — dependency-free and byte-stable. The torch converter
lives in tools/convert_checkpoint.py and uses `load_torch_gen_state` below.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SEP = "/"


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a nested dict/list pytree of arrays to {'a/b/0/c': array}."""
    out: Dict[str, np.ndarray] = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{path}{SEP}{k}" if path else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, f"{path}{SEP}{i}" if path else str(i))
        elif node is None:
            pass
        else:
            out[path] = np.asarray(node)

    rec(tree, prefix)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Any:
    """Inverse of flatten_tree. Integer path segments become lists."""
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def _json_sidecar(path: str) -> str:
    """checkpoint.npz -> checkpoint.json (extension only — str.replace
    would also rewrite '.npz' inside directory names)."""
    return os.path.splitext(path)[0] + ".json"


def save_checkpoint(path: str, trees: Dict[str, Any],
                    scalars: Optional[Dict[str, Any]] = None) -> None:
    """Save named pytrees + scalar metadata. `path` ends in .npz.

    Writes are atomic (tmp + os.replace): checkpoint.npz is the artifact
    NaN rollback and --resume depend on — an interrupt mid-save must not
    leave a truncated file in its place.
    """
    flat: Dict[str, np.ndarray] = {}
    for name, tree in trees.items():
        flat.update(flatten_tree(jax.device_get(tree), name))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)
    meta = _json_sidecar(path)
    with open(meta + ".tmp", "w") as f:
        json.dump(scalars or {}, f, indent=2)
    os.replace(meta + ".tmp", meta)


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (trees, scalars)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    tree = unflatten_tree(flat)
    meta_path = _json_sidecar(path)
    scalars = {}
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            scalars = json.load(f)
    return tree, scalars


def mark_best(logdir: str) -> None:
    """Copy checkpoint.npz -> model_best.npz (ref: trainer.py:411-414)."""
    src = os.path.join(logdir, "checkpoint.npz")
    shutil.copyfile(src, os.path.join(logdir, "model_best.npz"))
    meta = _json_sidecar(src)
    if os.path.isfile(meta):
        shutil.copyfile(meta, os.path.join(logdir, "model_best.json"))


# ---------------------------------------------------------------------------
# PyTorch state_dict -> tepose_tpu param pytrees
# ---------------------------------------------------------------------------


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def strip_module_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Drop the 'module.' prefix DataParallel-era torch checkpoints carry
    (ref: lib/utils/utils.py:40-45, check_data_pararell)."""
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in state_dict.items()}


def convert_torch_generator(state_dict: Dict[str, Any],
                            has_vibe_encoder: bool = False) -> Dict:
    """Map a TePose/VIBE generator torch state_dict onto our param pytree.

    Torch key layout (ref: tepose.py:44-119, vibe.py:27-99, spin.py:209-238):
      encoder.gru_fwd.weight_ih_l{k}[_reverse] ... -> encoder/gru_fwd/...
      encoder.linear_fwd.{weight,bias}             -> encoder/linear_fwd/...
      encoder.gru.* / encoder.linear.*             -> VIBE encoder
      regressor.{fc1,fc2,decpose,decshape,deccam}. -> regressor/...
      regressor.init_{pose,shape,cam}              -> regressor buffers
      regressor.smpl.*                             -> dropped (SMPL constants
                                                    live in the SmplModel)

    Layouts are identical (torch Linear (out,in); GRU (3H,in) gates r,z,n),
    so conversion is pure renaming.
    """
    params: Dict[str, Any] = {"encoder": {}, "regressor": {}}
    for key, val in strip_module_prefix(state_dict).items():
        parts = key.split(".")
        if parts[0] == "encoder":
            if parts[1] in ("gru_fwd", "gru_rec", "gru"):
                params["encoder"].setdefault(parts[1], {})[parts[2]] = \
                    _to_np(val)
            elif parts[1] in ("linear_fwd", "linear_rec", "linear"):
                params["encoder"].setdefault(parts[1], {})[parts[2]] = \
                    _to_np(val)
            # attention module exists in some checkpoints but is unused by
            # the forward pass (ref: tepose.py:11-41) -> dropped
        elif parts[0] == "regressor":
            if parts[1] in ("fc1", "fc2", "decpose", "decshape", "deccam"):
                params["regressor"].setdefault(parts[1], {})[parts[2]] = \
                    _to_np(val)
            elif parts[1] in ("init_pose", "init_shape", "init_cam"):
                params["regressor"][parts[1]] = _to_np(val)
            # regressor.smpl.* buffers dropped
    return params


def convert_torch_discriminator(
        state_dict: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Map MotionDiscriminatorGCN torch state_dict -> (params, state).

    Torch conv kernels are squeezed to our dense layouts:
      Conv2d 1x1 (O,I,1,1)        -> (O,I)
      TemporalConv (O,I,k,1)      -> (O,I,k)
      MS-G3D out Conv3d (O,C,1,w,1)-> (O,C,w)
    """
    from tepose_tpu.models.gcn import motion_discriminator_init

    params, state = motion_discriminator_init(jax.random.PRNGKey(0))

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = jnp.asarray(val)

    for key, val in strip_module_prefix(state_dict).items():
        v = _to_np(val)
        parts = key.split(".")
        name = parts[0]
        if name == "data_bn":
            if parts[1] in ("weight", "bias"):
                put(params, ["data_bn", parts[1]], v)
            elif parts[1] in ("running_mean", "running_var"):
                put(state, ["data_bn", parts[1]], v)
        elif name == "fc":
            put(params, ["fc", parts[1]], v)
        elif name.startswith("residual_"):
            if parts[1] == "conv":
                put(params, [name, "conv", parts[2]],
                    v[..., 0] if parts[2] == "weight" else v)
            elif parts[1] == "bn":
                tgt = params if parts[2] in ("weight", "bias") else state
                put(tgt, [name, "bn", parts[2]], v)
        elif name.startswith("sgcn"):
            if parts[1] == "A_res":
                put(params, [name, "A_res"], v)
            elif parts[1] == "mlp":
                _put_mlp(params, state, name, parts, v, sub=None)
        elif name.startswith("gcn3d"):
            if parts[1] == "gcn3d":  # Sequential: [1] = SpatialTemporal GCN
                if parts[3] == "A_res":
                    put(params, [name, "st", "A_res"], v)
                elif parts[3] == "mlp":
                    _put_mlp(params, state, name, parts[2:], v, sub="st")
            elif parts[1] == "out_conv":
                put(params, [name, "out_conv", parts[2]],
                    v[:, :, 0, :, 0] if parts[2] == "weight" else v)
            elif parts[1] == "out_bn":
                tgt = params if parts[2] in ("weight", "bias") else state
                put(tgt, [name, "out_bn", parts[2]], v)
    return params, state


def export_torch_generator(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse of `convert_torch_generator`: our generator pytree -> a flat
    torch-layout dict (pure renaming; layouts already mirror torch, see
    CLAUDE.md conventions).

    The torch TePose module additionally owns `regressor.smpl.*` constant
    buffers (smplx model data, ref: spin.py:226-231) that live in our
    SmplModel instead; the reverse CLI overlays those from a `--like`
    template checkpoint so the result survives the reference's strict
    `load_state_dict` (ref: evaluate.py:124, trainer.py:423).
    """
    return {k.replace(SEP, "."): np.asarray(v, np.float32)
            for k, v in flatten_tree(params).items()}


def _disc_torch_key(parts) -> str:
    """Translate one of our discriminator tree paths to the torch key.

    Inverts the routing in `convert_torch_discriminator`:
      gcn3dN/st/...            -> gcn3dN.gcn3d.1....   (Sequential slot 1)
      .../mlp/layers/0/conv/x  -> ....mlp.layers.0.x   (Conv2d at idx 3k)
      .../mlp/layers/0/bn/x    -> ....mlp.layers.1.x   (BN at idx 3k+1)
    """
    if parts[0].startswith("gcn3d") and parts[1] == "st":
        base, rest = [parts[0], "gcn3d", "1"], parts[2:]
    else:
        base, rest = [parts[0]], parts[1:]
    if rest[:2] == ["mlp", "layers"]:
        idx = int(rest[2]) * 3 + (0 if rest[3] == "conv" else 1)
        return ".".join(base + ["mlp", "layers", str(idx), rest[4]])
    return ".".join(base + rest)


def export_torch_discriminator(params: Dict, state: Dict) \
        -> Dict[str, np.ndarray]:
    """Inverse of `convert_torch_discriminator`: (params, state) -> flat
    torch-layout dict, re-expanding the squeezed conv kernels:

      TemporalConv (O,I,k)   -> Conv2d (O,I,k,1)
      MLP conv     (O,I)     -> Conv2d (O,I,1,1)
      MS-G3D out   (O,C,w)   -> Conv3d (O,C,1,w,1)

    Our state-only adjacency constants (A_powers/A_scales) are plain torch
    attributes in the reference (ms_gcn.py:36), not buffers — excluded.
    Every BN gets a zero `num_batches_tracked` (torch tracks it in the
    state_dict; it only affects momentum=None training, ref N/A here).
    """
    out: Dict[str, np.ndarray] = {}
    for key, val in flatten_tree(params).items():
        parts = key.split(SEP)
        v = np.asarray(val, np.float32)
        if parts[-1] == "weight":
            if "out_conv" in parts:
                v = v[:, :, None, :, None]
            elif parts[0].startswith("residual_") and "conv" in parts:
                v = v[..., None]
            elif "mlp" in parts and "conv" in parts:
                v = v[..., None, None]
        out[_disc_torch_key(parts)] = v
    for key, val in flatten_tree(state).items():
        parts = key.split(SEP)
        if parts[-1] in ("A_powers", "A_scales"):
            continue
        out[_disc_torch_key(parts)] = np.asarray(val, np.float32)
        if parts[-1] == "running_mean":
            tracked = _disc_torch_key(parts[:-1] + ["num_batches_tracked"])
            out[tracked] = np.asarray(0, np.int64)
    return out


def _put_mlp(params, state, block, parts, v, sub):
    """Torch MLP Sequential: layers.0 = Conv2d, layers.1 = BN (mlp.py:8-24).
    parts = [..., 'mlp', 'layers', idx, leaf]."""
    idx = int(parts[-2])
    leaf = parts[-1]
    layer = 0  # our MLP has one [conv, bn] pair per out_ch (always 1 here)
    p_block = params[block] if sub is None else params[block][sub]
    s_block = state[block] if sub is None else state[block][sub]
    if idx % 3 == 0:  # conv
        val = v[..., 0, 0] if leaf == "weight" else v
        p_block["mlp"]["layers"][layer]["conv"][leaf] = jnp.asarray(val)
    else:  # bn
        if leaf in ("weight", "bias"):
            p_block["mlp"]["layers"][layer]["bn"][leaf] = jnp.asarray(v)
        elif leaf in ("running_mean", "running_var"):
            s_block["mlp"]["layers"][layer]["bn"][leaf] = jnp.asarray(v)

"""Flat parameter packing: ship one buffer per dtype instead of hundreds.

Motivation (measured on the axon TPU tunnel, see bench notes): executing a
jitted program costs ~150 ms **per used input buffer** through the remote
tunnel, so a model with ~56 param leaves pays ~8 s per call regardless of
FLOPs, while the identical computation with a single packed input runs at the
~30 ms round-trip floor. Packing all pytree leaves into one flat vector per
dtype and slicing them back out *inside* the jitted program removes that
overhead entirely (the slices are free after XLA fusion) and also turns the
training carry (params + optimiser states + BN state) into a couple of
donatable buffers.

Usage:
    packer = FlatPacker((gen_params, disc_params, disc_state))
    flats  = packer.pack((gen_params, disc_params, disc_state))  # on host
    # inside jit:
    gen_params, disc_params, disc_state = packer.unpack(flats)
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FlatPacker:
    """Packs/unpacks an arbitrary pytree of arrays into one 1-D buffer per
    dtype. The template fixes the treedef, shapes, and dtype layout."""

    def __init__(self, template: Any):
        leaves, self._treedef = jax.tree_util.tree_flatten(template)
        self._shapes: List[Tuple[int, ...]] = []
        self._dtypes: List[np.dtype] = []
        self._offsets: List[int] = []
        sizes: Dict[np.dtype, int] = {}
        for leaf in leaves:
            arr = np.asarray(leaf)
            dt = np.dtype(arr.dtype)
            self._shapes.append(arr.shape)
            self._dtypes.append(dt)
            self._offsets.append(sizes.get(dt, 0))
            sizes[dt] = sizes.get(dt, 0) + int(arr.size)
        self._totals = sizes
        self._keys = sorted(sizes.keys(), key=str)

    @property
    def num_buffers(self) -> int:
        return len(self._keys)

    def total_size(self, dtype=np.float32) -> int:
        return self._totals.get(np.dtype(dtype), 0)

    def pack(self, tree: Any):
        """tree -> tuple of flat arrays (one per dtype, sorted by dtype name).

        Works on host (numpy) or device (jnp) values.
        """
        leaves = jax.tree_util.tree_leaves(tree)
        parts: Dict[np.dtype, list] = {k: [] for k in self._keys}
        for leaf, dt, shape in zip(leaves, self._dtypes, self._shapes):
            arr = jnp.asarray(leaf, dtype=dt)
            assert arr.shape == shape, (arr.shape, shape)
            parts[dt].append(arr.ravel())
        return tuple(jnp.concatenate(parts[k]) if parts[k]
                     else jnp.zeros((0,), k) for k in self._keys)

    def unpack(self, flats) -> Any:
        """Inverse of pack; usable inside jit (static slice offsets)."""
        if not isinstance(flats, (tuple, list)):
            flats = (flats,)
        by_dtype = dict(zip(self._keys, flats))
        leaves = []
        for dt, shape, off in zip(self._dtypes, self._shapes, self._offsets):
            size = int(np.prod(shape, dtype=np.int64)) if shape else 1
            flat = by_dtype[dt]
            leaves.append(
                jax.lax.slice_in_dim(flat, off, off + size).reshape(shape))
        return jax.tree_util.tree_unflatten(self._treedef, leaves)

    def pack_np(self, tree) -> tuple:
        """Host-side pack with plain numpy (single device_put afterwards is
        the caller's choice) — avoids one tunnel dispatch per leaf."""
        leaves = jax.tree_util.tree_leaves(tree)
        parts: Dict[np.dtype, list] = {k: [] for k in self._keys}
        for leaf, dt, shape in zip(leaves, self._dtypes, self._shapes):
            arr = np.asarray(leaf, dtype=dt)
            assert arr.shape == shape, (arr.shape, shape)
            parts[dt].append(arr.ravel())
        return tuple(np.concatenate(parts[k]) if parts[k]
                     else np.zeros((0,), k) for k in self._keys)

    def unpack_np(self, flats) -> Any:
        """Host-side unpack with plain numpy (no device dispatch) — for
        checkpointing a device-fetched flat carry."""
        if not isinstance(flats, (tuple, list)):
            flats = (flats,)
        by_dtype = dict(zip(self._keys, [np.asarray(f) for f in flats]))
        leaves = []
        for dt, shape, off in zip(self._dtypes, self._shapes, self._offsets):
            size = int(np.prod(shape, dtype=np.int64)) if shape else 1
            leaves.append(by_dtype[dt][off:off + size].reshape(shape))
        return jax.tree_util.tree_unflatten(self._treedef, leaves)


def pack_smpl(smpl) -> Dict[str, jnp.ndarray]:
    """The traced tensor fields of a SmplModel as a plain dict (the static
    tuple fields ride along in the template closure)."""
    return {
        "v_template": smpl.v_template,
        "shapedirs": smpl.shapedirs,
        "posedirs": smpl.posedirs,
        "j_regressor": smpl.j_regressor,
        "lbs_weights": smpl.lbs_weights,
        "j_regressor_extra": smpl.j_regressor_extra,
    }


def unpack_smpl(smpl_template, tensors: Dict[str, jnp.ndarray]):
    import dataclasses

    return dataclasses.replace(smpl_template, **tensors)

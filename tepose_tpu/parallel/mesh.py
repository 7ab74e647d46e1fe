"""Mesh + sharding utilities (jax.sharding / pjit style).

Replaces the reference's (absent) distributed backend with the JAX-native
recipe: build a Mesh over the devices, place batch pytrees with
NamedSharding(P("data", ...)), replicate parameters, and let GSPMD insert
collectives over ICI.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(tree: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Place every leaf with its leading (batch) axis sharded over the mesh.

    Scalars / 0-d leaves are replicated.
    """
    def place(x):
        # host np.asarray, NOT jnp: staging on the default device first
        # would transfer every array twice (device 0, then the resharded
        # placement) — device_put shards host arrays directly
        if not hasattr(x, "sharding"):
            x = np.asarray(x)
        if x.ndim == 0:
            spec = P()
        else:
            spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate every leaf across the mesh (weights, optimiser state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x if hasattr(x, "sharding") else np.asarray(x), sharding), tree)

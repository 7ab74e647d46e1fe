"""Mesh + sharding utilities (jax.sharding / pjit style).

Replaces the reference's (absent) distributed backend with the JAX-native
recipe: build a Mesh over the devices, place batch pytrees with
NamedSharding(P("data", ...)), replicate parameters, and let GSPMD insert
collectives over ICI.

Multi-process aware: after parallel.distributed.maybe_initialize,
jax.devices() is the GLOBAL (pod-wide, process-major) device list, so
make_mesh spans every host; shard_batch/replicate place through
distributed.put_global, where each process contributes only its local
slice of sharded batches (per-host data loading, SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tepose_tpu.parallel.distributed import put_global

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` GLOBAL devices.

    In a multi-process runtime the mesh must span every process's devices
    (jax arrays are assembled per-process from local shards), so
    `n_devices` defaults to all of them and sub-mesh requests are rejected.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if jax.process_count() > 1 and n_devices != len(devices):
            raise ValueError(
                f"multi-process runtime: the mesh must span all "
                f"{len(devices)} global devices, got n_devices={n_devices}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(tree: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Place every leaf with its leading (batch) axis sharded over the mesh.

    Scalars / 0-d leaves are replicated. Multi-process: each leaf must be
    this process's LOCAL batch slice (see distributed.host_local_rows);
    the global array is the process-major concatenation of all hosts'
    slices.
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
        return put_global(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate every leaf across the mesh (weights, optimiser state).

    Multi-process: every process passes the SAME full array (weights are
    host-identical by construction — same init seed / same checkpoint)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: put_global(x, sharding), tree)

"""Multi-process (multi-host pod) runtime plumbing.

TPU pods are multi-process by construction: one Python process per host,
each seeing only its local chips, coordinated through
``jax.distributed.initialize``. The reference has no multi-host story at
all (its only distributed vestige is the unused DataParallel prefix
stripper, ref: lib/utils/utils.py:40-45); this module is the rebuild's
TPU-native equivalent named in SURVEY.md §2.6 ("per-host data loading").

Design:

- ``maybe_initialize()`` wires a process into the coordination service from
  environment variables (set by the pod launcher / test harness). It must
  run BEFORE the first JAX backend query — after initialization,
  ``jax.devices()`` returns the GLOBAL device list, so
  ``parallel.mesh.make_mesh`` transparently builds a pod-wide mesh.
- ``put_global(x, sharding)`` is the single placement primitive the rest of
  ``parallel/`` uses. Single-process it is ``jax.device_put``; multi-process
  it is ``jax.make_array_from_process_local_data``, i.e. every process
  contributes only its OWN slice of the batch (per-host data loading) and
  JAX assembles the global array without any cross-host transfer.
- Host batch slicing follows the mesh's process-major device order
  (``jax.devices()`` sorts by process index), so process ``p`` of ``P``
  loads rows ``[p*B/P, (p+1)*B/P)`` of the global batch — the concatenation
  of all hosts' slices is bit-identical to the single-process batch
  (asserted by __graft_entry__.dryrun_multiprocess and
  tests/test_multiprocess.py).

On CPU (the test rig: 2 processes x 4 virtual devices) cross-process
collectives need the gloo backend; ``maybe_initialize`` configures it —
a no-op on real TPU where collectives ride ICI.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

ENV_COORDINATOR = "TEPOSE_COORDINATOR"
ENV_NUM_PROCESSES = "TEPOSE_NUM_PROCESSES"
ENV_PROCESS_ID = "TEPOSE_PROCESS_ID"

_STATE = {"initialized": False}


def maybe_initialize(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Join the multi-process coordination service if configured.

    Reads ``TEPOSE_COORDINATOR`` / ``TEPOSE_NUM_PROCESSES`` /
    ``TEPOSE_PROCESS_ID`` when arguments are omitted; returns False (and
    does nothing) when no coordinator is configured, so single-process
    entry points call this unconditionally. Idempotent.

    Must be called before the first JAX backend query of the process
    (before ``jax.devices()`` / any computation).
    """
    if _STATE["initialized"]:
        return True
    coordinator = coordinator or os.environ.get(ENV_COORDINATOR)
    if not coordinator:
        return False
    num_processes = int(num_processes if num_processes is not None
                        else os.environ[ENV_NUM_PROCESSES])
    process_id = int(process_id if process_id is not None
                     else os.environ[ENV_PROCESS_ID])

    import jax

    try:
        # CPU-backend cross-process collectives need gloo (the fake-device
        # test rig); on TPU this setting is unused — collectives ride ICI.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # older jax without the option
        pass
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _STATE["initialized"] = True
    return True


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns file artifacts (checkpoints, logs,
    debug renders). Multi-host checkpointing assumes the logdir is on a
    filesystem every host can read (standard pod setup) — only the primary
    writes it."""
    return process_index() == 0


def put_global(x: Any, sharding) -> Any:
    """Place host data onto a (possibly multi-process) mesh sharding.

    Single-process: plain ``jax.device_put`` (x is the full array).
    Multi-process: x must be this process's LOCAL shard — the rows this
    host loaded — and the global array is assembled zero-copy via
    ``jax.make_array_from_process_local_data``. For a replicated spec
    (PartitionSpec()), pass the full array on every process.
    """
    import jax

    if isinstance(x, jax.Array) and getattr(x, "sharding", None) == sharding:
        return x
    if not isinstance(x, np.ndarray):
        x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)


def host_local_rows(n_global: int) -> slice:
    """The contiguous row range this process loads of an ``n_global``-row
    batch sharded over the mesh's (process-major) data axis."""
    P = process_count()
    if n_global % P:
        raise ValueError(
            f"global batch of {n_global} rows does not divide across "
            f"{P} processes")
    per = n_global // P
    p = process_index()
    return slice(p * per, (p + 1) * per)


def barrier(name: str) -> None:
    """Block until every process reaches this point (no-op single-process).

    Used around checkpoint writes: the primary writes `checkpoint.npz` on
    the shared filesystem while other processes may need to READ it
    (NaNGuard rollback, train/fit.py) — without the barrier a reader can
    see a half-written file."""
    if process_count() == 1:
        return
    from jax.experimental import multihost_utils

    # line up over gRPC first: if this is the process's first collective,
    # the gloo communicator rendezvous below has a hard 30 s deadline
    # that startup/compile skew between processes can blow
    service_barrier(f"pre:{name}")
    multihost_utils.sync_global_devices(name)


def service_barrier(name: str, timeout_s: float = 600.0) -> None:
    """Line processes up over the coordination service's gRPC channel —
    NOT a device collective. Use before a program's FIRST cross-process
    collective: gloo's communicator rendezvous has a hard 30 s deadline,
    so on a contended host a fast process (warm compile cache) can reach
    the collective and time out while a slow one is still importing.
    `barrier()` above cannot serve here — it IS a collective. No-op
    single-process."""
    if process_count() == 1:
        return
    from jax._src import distributed as jdist

    client = getattr(jdist.global_state, "client", None)
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def broadcast_str(s: str, max_len: int = 512) -> str:
    """Broadcast a string from the primary to every process (used for the
    timestamped experiment dir, which must be the SAME path on all hosts so
    checkpoint rollback and resume read the primary's files). No-op
    single-process."""
    if process_count() == 1:
        return s
    from jax.experimental import multihost_utils

    # see barrier(): align over gRPC before the device collective so a
    # first-collective gloo rendezvous cannot time out on startup skew
    service_barrier("pre:broadcast_str")
    buf = np.zeros((max_len,), np.uint8)
    raw = s.encode()
    if len(raw) > max_len:
        raise ValueError(f"string of {len(raw)} bytes exceeds broadcast "
                         f"buffer of {max_len}")
    buf[:len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out[out != 0]).decode()


def host_slice_tree(tree: Any) -> Any:
    """Slice every >=1-d leaf of a GLOBAL batch pytree down to this
    process's local rows (0-d leaves pass through — they are replicated by
    ``parallel.mesh.shard_batch``). Mirrors shard_batch's spec choice, so
    ``shard_batch(host_slice_tree(global_batch))`` on every process
    reassembles exactly the single-process ``shard_batch(global_batch)``.

    Production loaders assemble local slices directly
    (data/loaders.BatchLoader num_shards); this helper is for
    harnesses/tests that start from a full deterministic batch."""
    import jax

    def f(x):
        x = np.asarray(x)
        return x if x.ndim == 0 else x[host_local_rows(x.shape[0])]

    return jax.tree_util.tree_map(f, tree)


def fetch_global(x: Any) -> np.ndarray:
    """Read a jax Array back to host numpy in either runtime.

    Fully-replicated arrays read back directly; sharded global arrays are
    allgathered across processes first (eval outputs in the dryrun/test
    harness — production readbacks are replicated metrics)."""
    import jax

    if not isinstance(x, jax.Array) or jax.process_count() == 1 or \
            x.sharding.is_fully_replicated:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))

"""Data-parallel training segment over a jax.sharding Mesh.

The reference has no working multi-GPU path (its DataParallel hooks are
unused); this is the TPU-new capability from SURVEY.md §2.6: replicate both
nets + optimiser state across the mesh, shard every batch on the leading
(batch) axis, and let GSPMD insert the ICI collectives (grad psums, masked-
mean reductions, row-masked BatchNorm stats) so the sharded program is
numerically identical to the single-device one — not per-replica-BN DDP.

`make_sharded_train_segment` intentionally mirrors the interface of
train.trainer.make_packed_train_segment (a (segment, carry_packer,
data_packer) triple whose "packers" place pytrees on the mesh) so
train.fit.TrainLoop drives either path unchanged. Packed single-buffer IO is
an axon-tunnel optimisation (see utils.packing) and unnecessary here: on a
real pod the per-buffer dispatch cost does not apply.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tepose_tpu.parallel.mesh import DATA_AXIS
from tepose_tpu.train.trainer import make_train_segment


class MeshTreePlacer:
    """FlatPacker-compatible shim: 'flats' are the pytree leaves, placed on
    the mesh at pack time (replicated for the carry; batch-sharded for data).

    amass batches are (num_iters, B, S, 85) and shard on axis 1; everything
    else shards on axis 0 (see train.fit.TrainLoop._amass_windows).
    """

    def __init__(self, template: Any, mesh: Mesh, mode: str):
        assert mode in ("replicate", "shard")
        self.treedef = jax.tree_util.tree_structure(template)
        self.mesh = mesh
        self.mode = mode

    def _sharding(self, path, x) -> NamedSharding:
        if self.mode == "replicate" or x.ndim == 0:
            return NamedSharding(self.mesh, P())
        top = path[0].key if hasattr(path[0], "key") else None
        if top == "amass":
            return NamedSharding(self.mesh, P(None, DATA_AXIS))
        return NamedSharding(self.mesh,
                             P(DATA_AXIS, *([None] * (x.ndim - 1))))

    def pack_np(self, tree: Any) -> tuple:
        # host np.asarray, NOT jnp: this runs once per training iteration
        # on the full batch pytree, and staging each leaf on the default
        # device before the sharded device_put would transfer every
        # multi-MB batch twice over the host link. put_global handles the
        # multi-process runtime, where each leaf is this host's LOCAL
        # batch slice (per-host loaders, data/loaders.py num_shards).
        from tepose_tpu.parallel.distributed import put_global

        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = []
        for path, x in leaves:
            if not hasattr(x, "sharding"):
                x = np.asarray(x)
            out.append(put_global(x, self._sharding(path, x)))
        return tuple(out)

    def unpack_np(self, flats) -> Any:
        return jax.tree_util.tree_unflatten(
            self.treedef, [np.asarray(f) for f in flats])

    # in-jit views (leaves already placed)
    def pack(self, tree: Any):
        return tuple(jax.tree_util.tree_leaves(tree))

    def unpack(self, flats) -> Any:
        return jax.tree_util.tree_unflatten(self.treedef, list(flats))


def check_divisible(hp, n_devices: int) -> None:
    """Data-parallel batches must split evenly across the mesh."""
    for name, n in (("n_2d", hp.n_2d), ("n_3d", hp.n_3d)):
        if n % n_devices:
            raise ValueError(
                f"TRAIN.BATCH_SIZE split {name}={n} is not divisible by "
                f"--devices {n_devices}; pick a batch size whose 2D/3D split "
                f"is a multiple of the device count")


def make_sharded_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx, weights,
                               num_iters, mesh: Mesh, carry_template,
                               data_template):
    """Mesh-parallel twin of make_packed_train_segment.

    Returns (fn, carry_placer, data_placer) with
      fn(carry_leaves, data_leaves, rng) -> (carry_leaves, metrics_vector)
    and fn.metric_names() like the packed variant.
    """
    check_divisible(hp, mesh.devices.size)
    base = make_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx, weights,
                              num_iters)
    carry_placer = MeshTreePlacer(carry_template, mesh, "replicate")
    data_placer = MeshTreePlacer(data_template, mesh, "shard")

    metric_names_box = {}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def sharded(carry_leaves, data_leaves, rng):
        gen_params, disc_params, disc_state, gen_opt, disc_opt = \
            carry_placer.unpack(carry_leaves)
        data = data_placer.unpack(data_leaves)
        out = base.body(gen_params, disc_params, disc_state, gen_opt,
                        disc_opt, data["batch_2d"], data["batch_3d"],
                        data["amass"], rng)
        metrics = out[5]
        metric_names_box.setdefault("names", sorted(metrics.keys()))
        mvec = jnp.stack([metrics[k] for k in sorted(metrics.keys())])
        return carry_placer.pack(out[:5]), mvec

    sharded.metric_names = lambda: metric_names_box.get("names")
    return sharded, carry_placer, data_placer

"""Offline preprocessing primitives: per-frame feature extraction.

ref: lib/data_utils/_feature_extractor.py:30-114 — runs the frozen SPIN
ResNet-50 over bbox crops to produce the (N, 2048) feature tracks stored in
every DB. Here the backbone runs on TPU with flat-packed weights; crops come
from the native C++ cropper.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tepose_tpu.models.backbone import resnet50_features
from tepose_tpu.native import crop_normalize
from tepose_tpu.utils.packing import FlatPacker


class FeatureExtractor:
    """Batched crop -> ResNet-50 feature pipeline with device-resident
    weights (one packed buffer; see utils.packing).

    `mesh` (optional jax.sharding.Mesh) data-parallelises the offline
    extraction: weights replicate, each crop batch shards on its leading
    axis, and every lax.map step processes `conv_chunk * n_devices` crops
    so each device keeps its measured per-device chunk optimum (16 f32 —
    the multi-chip counterpart of StreamingEngine's fused-path sharding
    for the DB-building pipeline, SURVEY §2.4/§2.6)."""

    def __init__(self, backbone_params: Dict, batch_size: int = 256,
                 crop_size: int = 224, conv_chunk: int = 16, mesh=None):
        # batch_size = crops per DEVICE CALL (big: the link charges per
        # call); conv_chunk = crops per lax.map step INSIDE the call (small:
        # 16 is the measured v5e conv optimum — see
        # streaming/engine.StreamingEngine.crop_batch). When batch_size
        # isn't a multiple of conv_chunk, use the largest divisor of
        # batch_size <= conv_chunk (falling back to one big chunk would be
        # the measured worst case — VMEM-thrashing conv activations).
        if mesh is not None:
            conv_chunk *= mesh.devices.size
            if batch_size % mesh.devices.size:
                raise ValueError(
                    f"batch_size {batch_size} must divide over the "
                    f"{mesh.devices.size}-device mesh")
        conv_chunk = min(conv_chunk, batch_size)
        while batch_size % conv_chunk:
            conv_chunk -= 1
        if mesh is not None and conv_chunk % mesh.devices.size:
            raise ValueError(
                f"no conv chunking of batch_size {batch_size} aligns with "
                f"the {mesh.devices.size}-device mesh; pick a batch_size "
                "divisible by devices*16")
        self.mesh = mesh
        self.batch_size = batch_size
        self.crop_size = crop_size
        self._packer = FlatPacker(backbone_params)
        self._flats = tuple(
            jax.device_put(jnp.asarray(f), self._weight_sharding())
            for f in self._packer.pack_np(backbone_params))
        packer = self._packer
        n_chunks = batch_size // conv_chunk

        @jax.jit
        def fn(flats, crops):
            params = packer.unpack(flats)

            def one(c):
                if c.dtype == jnp.uint8:  # on-device ImageNet normalisation
                    from tepose_tpu.models.backbone import normalize_crop
                    c = normalize_crop(c)
                return resnet50_features(params, c)

            chunked = crops.reshape((n_chunks, conv_chunk) + crops.shape[1:])
            if mesh is not None:
                # shard each map step's chunk across devices (NOT the chunk
                # axis: lax.map is serial, so sharding axis 0 would leave
                # devices idle) — every step runs conv_chunk/n_devices
                # crops per device with fully-local conv inputs
                from jax.sharding import NamedSharding, PartitionSpec as P

                from tepose_tpu.parallel.mesh import DATA_AXIS

                chunked = jax.lax.with_sharding_constraint(
                    chunked, NamedSharding(
                        mesh, P(None, DATA_AXIS, None, None, None)))
            out = jax.lax.map(one, chunked)
            return out.reshape(batch_size, 2048)

        self._fn = fn

    def _weight_sharding(self):
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P())

    def _batch_sharding(self):
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tepose_tpu.parallel.mesh import DATA_AXIS

        return NamedSharding(self.mesh, P(DATA_AXIS, None, None, None))

    def features_from_crops(self, crops: np.ndarray) -> np.ndarray:
        """(N, 3, S, S) -> (N, 2048); uint8 crops normalise on-device."""
        N = len(crops)
        B = self.batch_size
        out = np.zeros((N, 2048), np.float32)
        for i in range(0, N, B):
            chunk = crops[i:i + B]
            n = len(chunk)
            if n < B:
                chunk = np.concatenate(
                    [chunk, np.zeros((B - n,) + chunk.shape[1:],
                                     chunk.dtype)])
            dev = jnp.asarray(chunk) if self.mesh is None else \
                jax.device_put(chunk, self._batch_sharding())
            out[i:i + n] = np.asarray(self._fn(self._flats, dev))[:n]
        return out

    def extract_from_images(self, image_paths: Sequence[str],
                            bboxes: np.ndarray, scale: float = 1.3,
                            augment_fn=None) -> np.ndarray:
        """Image files + (N, 4) cxcywh bboxes -> (N, 2048) features.

        ref: _feature_extractor.py:30-114 (scale=1.3 crop like the reference
        extract_features default for DB building). `augment_fn(img) -> img`
        runs on the full frame before cropping — the hook the `*_occ` DB
        variants use (data.occlusion.occlude_with_objects).
        """
        import cv2

        crops = np.zeros((len(image_paths), 3, self.crop_size,
                          self.crop_size), np.uint8)
        for i, path in enumerate(image_paths):
            img = cv2.cvtColor(cv2.imread(str(path)), cv2.COLOR_BGR2RGB)
            if augment_fn is not None:
                img = augment_fn(img)
            crops[i] = crop_normalize(img, bboxes[i:i + 1],
                                      self.crop_size, scale,
                                      normalize=False)[0]
        return self.features_from_crops(crops)

    def extract_from_frames(self, frames: Sequence[np.ndarray],
                            bboxes: np.ndarray,
                            scale: float = 1.3) -> np.ndarray:
        """In-memory RGB frames + bboxes -> features."""
        crops = np.stack([
            crop_normalize(frames[i], bboxes[i:i + 1], self.crop_size,
                           scale, normalize=False)[0]
            for i in range(len(frames))])
        return self.features_from_crops(crops)

"""The live-stream inference engine: crops -> features -> windowed scan.

ref: demo.py:161-260 (per-tracklet pipeline: CropDataset -> hmr
feature_extractor -> VIBE bootstrap -> sequential TePose windows) and
SURVEY.md §5 (host->HBM double buffering north star).

TPU-first design:
  * the ResNet-50 feature extractor and the TePose window scan are two jitted
    programs with all weights flat-packed into a single device buffer each
    (see utils.packing — the remote link charges per input buffer);
  * bbox crops are produced by the native C++ cropper (tepose_tpu.native)
    directly into the pinned numpy array that feeds the device, while the
    previous batch is in flight (double buffering);
  * tracklet lengths are bucketed to bounded padded shapes so the scan
    compiles a handful of programs regardless of video length.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tepose_tpu.parallel.mesh import DATA_AXIS

from tepose_tpu.models.smpl import SmplModel
from tepose_tpu.models.tepose import (
    TePoseConfig, VibeConfig, vibe_apply)
from tepose_tpu.models.backbone import resnet50_features
from tepose_tpu.streaming.fast_scan import fast_stream_scan
from tepose_tpu.utils.packing import FlatPacker, pack_smpl, unpack_smpl
from tepose_tpu.utils.profiling import StageTimer


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _check_same_dtype(crops_list) -> None:
    dtypes = {np.asarray(c).dtype.str for c in crops_list}
    if len(dtypes) > 1:
        # silent promotion would skip the on-device /255+ImageNet
        # normalisation for the u8 crops
        raise ValueError(
            f"mixed crop dtypes {sorted(dtypes)}: pass all-uint8 (raw) "
            "or all-float32 (ImageNet-normalised) tracklets")


def _backbone_chunk(bb_params, crops, dtype=None):
    """Normalise one crop chunk and run the backbone, returning f32 features.

    uint8 crops get ImageNet normalisation here on the accelerator —
    shipping u8 over the link is 4x cheaper than f32 (see
    native.crop_normalize(normalize=False)). `dtype=jnp.bfloat16` casts
    weights + activations for the conv stack (MXU bf16 passes), f32 out.
    """
    if crops.dtype == jnp.uint8:
        from tepose_tpu.models.backbone import normalize_crop
        crops = normalize_crop(crops)
    if dtype is not None:
        bb_params = jax.tree_util.tree_map(lambda x: x.astype(dtype),
                                           bb_params)
        crops = crops.astype(dtype)
    return resnet50_features(bb_params, crops).astype(jnp.float32)


ENGINE_OUTPUTS = ("theta", "verts", "kp_3d", "kp_2d")

# Composed serving presets (VERDICT r4 #4): the individually-measured
# serving knobs shipped as one switch. Values are the non-default knob
# settings a preset fills in; explicitly-passed knobs always win.
#   serving        — bf16 ResNet-50 (+11% at its chunk optimum, ~0.13%
#                    relative feature error) + f16 output readbacks (+53%
#                    on-link; theta stays f32, see output_dtype note) with
#                    the full output set — drop-in for the demo/mesh path.
#   serving-joints — the above plus the joints-only output set (no 6890x3
#                    verts shipped at all) — the pose-stream serving twin
#                    of configs/fast_train.yaml.
# Composition parity is gated by tests/test_engine.py
# (test_serving_preset_composition); measured composed throughput is the
# bench's end_to_end_serving_* fields. (ref knobs it replaces: the
# reference's demo runs one f32 path, demo.py:171-252.)
ENGINE_PRESETS = ("parity", "serving", "serving-joints")


def apply_engine_preset(preset, backbone_dtype, output_dtype, outputs):
    """Fill still-at-default engine knobs from a named preset.

    Returns (backbone_dtype, output_dtype, outputs). Knobs the caller set
    explicitly (non-default values) are left untouched, so a preset can be
    combined with overrides; to force a default-valued knob (e.g. an f32
    backbone) with serving outputs, set the knobs directly instead of
    using a preset.
    """
    if preset is None or preset == "parity":
        return backbone_dtype, output_dtype, outputs
    if preset not in ENGINE_PRESETS:
        raise ValueError(
            f"unknown preset {preset!r}; choose from {ENGINE_PRESETS}")
    if backbone_dtype is None:
        backbone_dtype = jnp.bfloat16
    if output_dtype is None:
        output_dtype = jnp.float16
    if preset == "serving-joints" and tuple(outputs) == ENGINE_OUTPUTS:
        outputs = ("theta", "kp_3d")
    return backbone_dtype, output_dtype, outputs


class StreamingEngine:
    """Per-tracklet streaming inference with device-resident weights."""

    def __init__(self, smpl: SmplModel, tepose_params, vibe_params,
                 backbone_params, model_cfg: TePoseConfig,
                 vibe_cfg: VibeConfig, crop_batch: Optional[int] = None,
                 window_bucket: int = 64, max_frames_per_call: int = 4096,
                 backbone_dtype=None, mesh=None,
                 outputs=ENGINE_OUTPUTS, output_dtype=None, preset=None):
        # preset: "serving" / "serving-joints" — the composed serving
        # switch (see ENGINE_PRESETS); fills the dtype/output knobs below
        backbone_dtype, output_dtype, outputs = apply_engine_preset(
            preset, backbone_dtype, output_dtype, outputs)
        self.smpl = smpl
        self.model_cfg = model_cfg
        self.vibe_cfg = vibe_cfg
        # crops per lax.map step of the chunked ResNet-50; the optimum is
        # DTYPE-DEPENDENT (measured on v5e, tools/bench_notes.py
        # backbone_chunk_sweep + fused-program timings):
        #   f32:  16 is best (9.2k crops/s vs 8.1k at 32, 7.2k at 120) —
        #         small chunks keep early-stage conv activations
        #         (112x112x64 etc.) VMEM-resident between fused layers;
        #         below 16 the MXU starves (8 -> 6.9k);
        #   bf16: halved activation bytes fit VMEM at larger batches, so
        #         the optimum shifts to ~128 (fused 8.3k fps vs 7.5k at 16).
        # With f32 properly chunked, bf16's fused-path edge is ~1.11x (the
        # older "1.43x" was measured against a VMEM-thrashing f32 chunk).
        if crop_batch is None:
            crop_batch = 16 if backbone_dtype is None else 128
        self.crop_batch = crop_batch
        self.window_bucket = window_bucket
        # bounds one transfer to ~600 MB of u8 crops at the default batch
        self.max_frames_per_call = max_frames_per_call
        # None = f32 (strict parity). jnp.bfloat16 runs the ResNet-50 in
        # bf16 (~1.11x fused at its own chunk optimum, ~0.13% relative
        # feature error) — the live-demo speed knob; eval paths stay f32.
        self.backbone_dtype = backbone_dtype
        # readback-traffic knobs (VERDICT r2: the link is the measured e2e
        # bottleneck; verts are 83 KB/frame in f32):
        #   outputs: which per-frame tensors to compute/ship, e.g.
        #     ("theta", "kp_3d") for joints-only serving without meshes;
        #   output_dtype: jnp.float16 halves every shipped byte except
        #     theta (kept f32 — it feeds back into the scan and a coarse
        #     camera/pose would compound; verts at f16 are <1 mm off,
        #     far below render precision).
        bad = set(outputs) - set(ENGINE_OUTPUTS)
        if bad:
            raise ValueError(f"unknown outputs {sorted(bad)}; "
                             f"choose from {ENGINE_OUTPUTS}")
        if not outputs:
            raise ValueError("outputs must be non-empty")
        self.outputs = tuple(outputs)
        self.output_dtype = output_dtype
        # optional jax.sharding.Mesh: tracklet batches shard over the mesh's
        # data axis (weights replicated; each stream's theta-feedback chain
        # is independent, so serving scales with zero collectives — the
        # multi-chip counterpart of parallel/dp.py for the demo path)
        self.mesh = mesh
        # per-stage wall timing (utils.profiling.StageTimer); the dict
        # view keeps the old `engine.timings["features"]` API working
        self.timers = StageTimer()

        # ---- packed weights (replicated over the mesh when one is set) -----
        bb_template = backbone_params
        self._bb_packer = FlatPacker(bb_template)
        self._bb_flats = tuple(
            self._put_weights(f)
            for f in self._bb_packer.pack_np(bb_template))

        gen_template = (tepose_params, vibe_params, pack_smpl(smpl))
        self._gen_packer = FlatPacker(gen_template)
        self._gen_flats = tuple(
            self._put_weights(f)
            for f in self._gen_packer.pack_np(gen_template))

        self._features_fns: Dict[tuple, callable] = {}
        self._stream_fns: Dict[int, callable] = {}
        self._fused_fns: Dict[tuple, callable] = {}

    # ---------------------------------------------------------------- mesh

    def _put_weights(self, x):
        # host arrays go straight to their final placement: staging via
        # jnp.asarray first would land them on device 0 and transfer twice
        if self.mesh is None:
            return jax.device_put(jnp.asarray(x))
        return jax.device_put(x, NamedSharding(self.mesh, P()))

    def _put_batch(self, x):
        """Place a (B, ...) buffer batch-sharded over the mesh's data axis
        (no-op without a mesh)."""
        if self.mesh is None:
            return jnp.asarray(x)
        spec = P(DATA_AXIS, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def _pad_batch(self, b: int) -> int:
        """Pad the tracklet-batch axis to a power of two (O(log B) compiled
        programs per bucket) and, in mesh mode, to a device-count multiple
        so the shard splits evenly."""
        b = 1 << max(b - 1, 0).bit_length()
        if self.mesh is not None:
            b = _round_up(b, self.mesh.devices.size)
        return b

    # ------------------------------------------------------------------ feats

    @property
    def timings(self) -> Dict[str, float]:
        return {k: v for k, v in self.timers.totals.items()}

    def extract_features(self, crops: np.ndarray) -> np.ndarray:
        """(N, 3, 224, 224) crops -> (N, 2048) features. float32 crops must
        be ImageNet-normalised already; uint8 crops are normalised on-device
        (4x cheaper to transfer)."""
        return self.extract_features_multi([crops])[0]

    def extract_features_multi(self, crops_list: List[np.ndarray]
                               ) -> List[np.ndarray]:
        """Batched multi-tracklet feature extraction in ONE device call.

        All tracklets' crops ship as a single padded buffer and the backbone
        runs chunk-by-chunk on device via `lax.map` (bounded activation
        memory at any total length), so the per-call link overhead — ~0.5 s
        on the axon tunnel, the dominant cost of the old one-call-per-chunk
        loop — is paid once per `max_frames_per_call` regardless of how many
        tracklets/chunks there are. ref: demo.py:171-198 (the per-crop
        feature loop this replaces).
        """
        with self.timers.stage("features"):
            return self._extract_features_multi(crops_list)

    def _extract_features_multi(self, crops_list):
        if not crops_list:
            return []
        _check_same_dtype(crops_list)
        lens = [len(c) for c in crops_list]
        flat = np.concatenate([np.ascontiguousarray(c) for c in crops_list])
        feats = np.empty((len(flat), 2048), np.float32)
        for i in range(0, len(flat), self.max_frames_per_call):
            sub = flat[i:i + self.max_frames_per_call]
            feats[i:i + len(sub)] = self._extract_features_one_call(sub)
        out, ofs = [], 0
        for n in lens:
            out.append(feats[ofs:ofs + n])
            ofs += n
        return out

    def _extract_features_one_call(self, crops: np.ndarray) -> np.ndarray:
        B = self.crop_batch
        if self.mesh is not None:
            # shard each lax.map chunk's batch axis over the mesh (the
            # chunk axis itself is a sequential scan and cannot shard);
            # the per-chunk batch must divide the device count
            B = _round_up(B, self.mesh.devices.size)
        n_chunks = max(_round_up(len(crops), B) // B, 1)
        # pad chunk count to a power of two: O(log N) compiled programs
        n_chunks = 1 << (n_chunks - 1).bit_length()
        buf = np.zeros((n_chunks * B,) + crops.shape[1:], crops.dtype)
        buf[:len(crops)] = crops
        fn = self._get_features_fn(
            (n_chunks, crops.dtype.str, str(self.backbone_dtype)))
        chunks = buf.reshape((n_chunks, B) + crops.shape[1:])
        if self.mesh is not None:
            # shard the host buffer in one hop — staging it on device 0
            # first would double the link traffic of the biggest transfer
            chunks = jax.device_put(chunks, NamedSharding(
                self.mesh, P(None, DATA_AXIS,
                             *([None] * (chunks.ndim - 2)))))
        else:
            chunks = jnp.asarray(chunks)
        feats = np.asarray(fn(self._bb_flats, chunks))
        return feats.reshape(n_chunks * B, -1)[:len(crops)]

    def _get_features_fn(self, key):
        if key in self._features_fns:
            return self._features_fns[key]
        bbp = self._bb_packer
        bb_dtype = self.backbone_dtype

        @jax.jit
        def features_fn(flats, chunks):
            params = bbp.unpack(flats)
            return jax.lax.map(
                lambda c: _backbone_chunk(params, c, bb_dtype), chunks)

        self._features_fns[key] = features_fn
        return features_fn

    # ----------------------------------------------------------------- stream

    def _boot_and_scan(self, tepose_params, vibe_params, model, feats,
                       theta_pseu, W):
        """VIBE first-window bootstrap + lane-batched theta-feedback scan
        (the shared tail of the feature-level and fused crop-level
        programs). ref: demo.py:229-252."""
        S = self.model_cfg.seqlen
        vibe_out = vibe_apply(vibe_params, model, feats[:, :S],
                              self.vibe_cfg)
        boot = {k: vibe_out[k][:, :S - 1] for k in self.outputs}
        scanned = fast_stream_scan(
            tepose_params, model, feats, theta_pseu, self.model_cfg, W,
            outputs=self.outputs)
        out = {k: jnp.concatenate([boot[k], scanned[k]], axis=1)
               for k in boot}
        if self.output_dtype is not None:
            # cast on-device just before readback; theta stays f32 (it is
            # the feedback signal and the checkpoint-able pose params)
            out = {k: v if k == "theta" else v.astype(self.output_dtype)
                   for k, v in out.items()}
        return out

    def _get_stream_fn(self, key):
        if key in self._stream_fns:
            return self._stream_fns[key]
        T_pad, _B = key if isinstance(key, tuple) else (key, 1)
        W = T_pad - self.model_cfg.seqlen + 1
        packer = self._gen_packer
        smpl_template = self.smpl

        @jax.jit
        def stream(flats, feats, theta_pseu):
            tepose_params, vibe_params, smpl_t = packer.unpack(flats)
            model = unpack_smpl(smpl_template, smpl_t)
            return self._boot_and_scan(tepose_params, vibe_params, model,
                                       feats, theta_pseu, W)

        self._stream_fns[key] = stream
        return stream

    def run_tracklets_from_crops(self, crops_list: List[np.ndarray],
                                 theta_pseu_list=None):
        """Fused crops -> features -> windowed scan -> outputs, ONE device
        call per length bucket.

        The features never visit the host: the backbone (chunked via
        `lax.map`), the VIBE bootstrap and the theta-feedback scan run as a
        single XLA program, so each tracklet bucket costs exactly one crop
        upload + one output readback. This is the production streaming path
        (ref: demo.py:171-252 runs crops->features and features->theta as
        two separate torch loops with a host hop between them).

        crops_list: list of (T_i, 3, 224, 224), all u8 (raw) or all f32
        (pre-normalised) — mixing dtypes is rejected, the two conventions
        need different on-device normalisation. Buckets whose padded crop
        buffer would exceed `max_frames_per_call` frames fall back to the
        two-stage path (super-chunked feature extraction + feature scan),
        bounding host/device memory on long videos.
        """
        S = self.model_cfg.seqlen
        for c in crops_list:
            if len(c) < S:
                raise ValueError(f"tracklet too short: {len(c)} < {S}")
        _check_same_dtype(crops_list)
        if theta_pseu_list is None:
            theta_pseu_list = [None] * len(crops_list)

        buckets: Dict[int, list] = {}
        for i, c in enumerate(crops_list):
            buckets.setdefault(_round_up(len(c), self.window_bucket),
                               []).append(i)

        results: List[Optional[Dict[str, np.ndarray]]] = \
            [None] * len(crops_list)
        # depth-2 bucket pipeline: dispatch bucket N+1 (host packing +
        # upload, both host/link work) before draining bucket N's readback,
        # so the device computes while the host prepares the next bucket.
        # jit dispatch is async, so `out` below is a future; only the
        # np.asarray drain blocks. Depth 2 bounds live HBM to two buckets.
        pending = None  # (idxs, out-dict of device arrays)

        def drain(p):
            idxs_p, out_p = p
            host = {k: np.asarray(v) for k, v in out_p.items()}
            for b, i in enumerate(idxs_p):
                T = len(crops_list[i])
                # .copy(): a view would pin the whole padded bucket buffer
                results[i] = {k: v[b, :T].copy() for k, v in host.items()}

        for T_pad, idxs in buckets.items():
            B_pad = self._pad_batch(len(idxs))
            if B_pad * T_pad > self.max_frames_per_call:
                # long-video guard: the fused buffer would be unbounded;
                # extract features in bounded super-chunks instead
                if pending is not None:
                    drain(pending)
                    pending = None
                feats = self.extract_features_multi(
                    [crops_list[i] for i in idxs])
                with self.timers.stage("stream"):
                    sub = self._run_tracklets(
                        feats, [theta_pseu_list[i] for i in idxs])
                for out, i in zip(sub, idxs):
                    results[i] = out
                continue
            dtype = crops_list[idxs[0]].dtype
            crops = np.zeros((B_pad, T_pad) + crops_list[idxs[0]].shape[1:],
                             dtype)
            pseu = np.zeros((B_pad, S - 1, 85), np.float32)
            pseu[:, :, 0] = 1.0
            for b, i in enumerate(idxs):
                crops[b, :len(crops_list[i])] = crops_list[i]
                if theta_pseu_list[i] is not None:
                    pseu[b] = theta_pseu_list[i]
            fn = self._get_fused_fn(
                (T_pad, B_pad, dtype.str, str(self.backbone_dtype)))
            with self.timers.stage("fused"):
                out = fn(self._bb_flats, self._gen_flats,
                         self._put_batch(crops), self._put_batch(pseu))
                if pending is not None:
                    # drain inside the stage: the blocking readback is the
                    # dominant cost and must show up in the timings
                    drain(pending)
            pending = (idxs, out)
        if pending is not None:
            with self.timers.stage("fused"):
                drain(pending)
        return results

    def _get_fused_fn(self, key):
        if key in self._fused_fns:
            return self._fused_fns[key]
        T_pad, B_pad = key[0], key[1]
        S = self.model_cfg.seqlen
        W = T_pad - S + 1
        bbp, packer = self._bb_packer, self._gen_packer
        smpl_template = self.smpl
        chunk = self.crop_batch
        n_chunks = max(_round_up(B_pad * T_pad, chunk) // chunk, 1)
        bb_dtype = self.backbone_dtype
        mesh = self.mesh

        @jax.jit
        def fused(bb_flats, gen_flats, crops, theta_pseu):
            bb_params = bbp.unpack(bb_flats)
            tepose_params, vibe_params, smpl_t = packer.unpack(gen_flats)
            model = unpack_smpl(smpl_template, smpl_t)

            if mesh is not None:
                # mesh mode: chunk over TIME per stream, never across the
                # batch axis — crop_batch-boundaries that cross the batch
                # shards would force GSPMD to gather conv inputs across
                # devices (measured: pathological partitioned compile).
                # Each map step runs (B, ct) frames B-major, so every
                # device keeps its own streams' frames local and conv
                # activations stay bounded by ~crop_batch frames/device.
                n_dev = mesh.devices.size
                ct = max(1, (chunk * n_dev) // B_pad)
                n_t = -(-T_pad // ct)
                c = jnp.pad(crops, ((0, 0), (0, n_t * ct - T_pad),
                                    (0, 0), (0, 0), (0, 0)))
                c = jnp.swapaxes(
                    c.reshape((B_pad, n_t, ct) + crops.shape[2:]), 0, 1)

                def one_t(cc):
                    flat_t = cc.reshape((-1,) + cc.shape[2:])  # B-major
                    f = _backbone_chunk(bb_params, flat_t, bb_dtype)
                    return f.reshape(B_pad, ct, 2048)

                feats = jnp.swapaxes(jax.lax.map(one_t, c), 0, 1)
                feats = feats.reshape(B_pad, n_t * ct, 2048)[:, :T_pad]
            else:
                flat = crops.reshape((-1,) + crops.shape[2:])
                pad = n_chunks * chunk - flat.shape[0]
                flat = jnp.pad(flat, ((0, pad), (0, 0), (0, 0), (0, 0)))
                feats = jax.lax.map(
                    lambda c: _backbone_chunk(bb_params, c, bb_dtype),
                    flat.reshape((n_chunks, chunk) + flat.shape[1:]))
                feats = feats.reshape(-1, 2048)[:B_pad * T_pad]
                feats = feats.reshape(B_pad, T_pad, 2048)

            return self._boot_and_scan(tepose_params, vibe_params, model,
                                       feats, theta_pseu, W)

        self._fused_fns[key] = fused
        return fused

    def run_tracklet(self, features: np.ndarray,
                     theta_pseu: Optional[np.ndarray] = None
                     ) -> Dict[str, np.ndarray]:
        """features (T, 2048) -> per-frame dict (T, ...) of theta/verts/
        kp_3d/kp_2d. The theta buffer bootstraps from `theta_pseu`
        ((S-1, 85)) or zeros with identity cam."""
        return self.run_tracklets([features],
                                  None if theta_pseu is None
                                  else [theta_pseu])[0]

    def run_tracklets(self, features_list, theta_pseu_list=None):
        """Batched multi-tracklet streaming: tracklets are grouped by padded
        length and advance together through one scan program per bucket
        (multi-person videos get near-single-person wall time).

        features_list: list of (T_i, 2048); returns a list of per-frame
        output dicts aligned with the input order.
        """
        with self.timers.stage("stream"):
            return self._run_tracklets(features_list, theta_pseu_list)

    def _run_tracklets(self, features_list, theta_pseu_list):
        S = self.model_cfg.seqlen
        for f in features_list:
            if len(f) < S:
                raise ValueError(f"tracklet too short: {len(f)} < {S}")
        if theta_pseu_list is None:
            theta_pseu_list = [None] * len(features_list)

        buckets: Dict[int, list] = {}
        for i, f in enumerate(features_list):
            buckets.setdefault(_round_up(len(f), self.window_bucket),
                               []).append(i)

        results: List[Optional[Dict[str, np.ndarray]]] =             [None] * len(features_list)
        # depth-2 bucket pipeline (see run_tracklets_from_crops): dispatch
        # the next bucket before draining the previous one's readback
        pending = None

        def drain(p):
            idxs_p, out_p = p
            # ONE bulk readback per output key (the link charges per call:
            # per-tracklet sliced reads would cost B x len(out) round trips).
            # .copy(): a plain slice would be a VIEW pinning the whole padded
            # (B_pad, T_pad, ...) bucket buffer alive per result
            host = {k: np.asarray(v) for k, v in out_p.items()}
            for b, i in enumerate(idxs_p):
                T = len(features_list[i])
                results[i] = {k: v[b, :T].copy() for k, v in host.items()}

        for T_pad, idxs in buckets.items():
            B = len(idxs)
            # pad the batch axis to a power of two: bounds the number of
            # compiled (T_pad, B) programs to O(log B) per length bucket;
            # rows are independent (eval-mode BN), so pad rows are free to
            # discard
            B_pad = self._pad_batch(B)
            feats = np.zeros((B_pad, T_pad, 2048), np.float32)
            pseu = np.zeros((B_pad, S - 1, 85), np.float32)
            pseu[:, :, 0] = 1.0
            for b, i in enumerate(idxs):
                feats[b, :len(features_list[i])] = features_list[i]
                if theta_pseu_list[i] is not None:
                    pseu[b] = theta_pseu_list[i]
            fn = self._get_stream_fn((T_pad, B_pad))
            out = fn(self._gen_flats, self._put_batch(feats),
                     self._put_batch(pseu))
            if pending is not None:
                drain(pending)
            pending = (idxs, out)
        if pending is not None:
            drain(pending)
        return results

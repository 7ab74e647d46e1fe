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

from tepose_tpu.models.smpl import SmplModel
from tepose_tpu.models.tepose import (
    TePoseConfig, VibeConfig, vibe_apply)
from tepose_tpu.models.backbone import resnet50_features
from tepose_tpu.streaming.fast_scan import fast_stream_scan
from tepose_tpu.utils.packing import FlatPacker, pack_smpl, unpack_smpl
from tepose_tpu.utils.profiling import StageTimer


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


class StreamingEngine:
    """Per-tracklet streaming inference with device-resident weights."""

    def __init__(self, smpl: SmplModel, tepose_params, vibe_params,
                 backbone_params, model_cfg: TePoseConfig,
                 vibe_cfg: VibeConfig, crop_batch: int = 32,
                 window_bucket: int = 64):
        self.smpl = smpl
        self.model_cfg = model_cfg
        self.vibe_cfg = vibe_cfg
        self.crop_batch = crop_batch
        self.window_bucket = window_bucket
        # per-stage wall timing (utils.profiling.StageTimer); the dict
        # view keeps the old `engine.timings["features"]` API working
        self.timers = StageTimer()

        # ---- packed weights ------------------------------------------------
        bb_template = backbone_params
        self._bb_packer = FlatPacker(bb_template)
        self._bb_flats = tuple(
            jax.device_put(jnp.asarray(f))
            for f in self._bb_packer.pack_np(bb_template))

        gen_template = (tepose_params, vibe_params, pack_smpl(smpl))
        self._gen_packer = FlatPacker(gen_template)
        self._gen_flats = tuple(
            jax.device_put(jnp.asarray(f))
            for f in self._gen_packer.pack_np(gen_template))

        bbp = self._bb_packer

        @jax.jit
        def features_fn(flats, crops):
            params = bbp.unpack(flats)
            if crops.dtype == jnp.uint8:
                # raw uint8 crops: ImageNet normalisation happens here on
                # the accelerator — shipping u8 over the link is 4x cheaper
                # than f32 (see native.crop_normalize(normalize=False))
                mean = jnp.asarray([0.485, 0.456, 0.406],
                                   jnp.float32).reshape(1, 3, 1, 1)
                std = jnp.asarray([0.229, 0.224, 0.225],
                                  jnp.float32).reshape(1, 3, 1, 1)
                crops = (crops.astype(jnp.float32) / 255.0 - mean) / std
            return resnet50_features(params, crops)

        self._features_fn = features_fn
        self._stream_fns: Dict[int, callable] = {}

    # ------------------------------------------------------------------ feats

    @property
    def timings(self) -> Dict[str, float]:
        return {k: v for k, v in self.timers.totals.items()}

    def extract_features(self, crops: np.ndarray) -> np.ndarray:
        """(N, 3, 224, 224) crops -> (N, 2048) features, batched with double
        buffering. float32 crops must be ImageNet-normalised already; uint8
        crops are normalised on-device (cheaper to transfer)."""
        with self.timers.stage("features"):
            return self._extract_features(crops)

    def _extract_features(self, crops: np.ndarray) -> np.ndarray:
        N = len(crops)
        B = self.crop_batch
        out = np.zeros((N, 2048), np.float32)
        pending = []
        for i in range(0, N, B):
            chunk = crops[i:i + B]
            if len(chunk) < B:
                chunk = np.concatenate(
                    [chunk, np.zeros((B - len(chunk),) + chunk.shape[1:],
                                     chunk.dtype)])
            feats = self._features_fn(self._bb_flats, jnp.asarray(chunk))
            pending.append((i, min(B, N - i), feats))
            # drain early to bound in-flight memory, keep 2 in flight
            if len(pending) > 2:
                j, n, f = pending.pop(0)
                out[j:j + n] = np.asarray(f)[:n]
        for j, n, f in pending:
            out[j:j + n] = np.asarray(f)[:n]
        return out

    # ----------------------------------------------------------------- stream

    def _get_stream_fn(self, key):
        if key in self._stream_fns:
            return self._stream_fns[key]
        T_pad, _B = key if isinstance(key, tuple) else (key, 1)
        S = self.model_cfg.seqlen
        W = T_pad - S + 1
        packer = self._gen_packer
        smpl_template = self.smpl
        mcfg, vcfg = self.model_cfg, self.vibe_cfg

        @jax.jit
        def stream(flats, feats, theta_pseu):
            tepose_params, vibe_params, smpl_t = packer.unpack(flats)
            model = unpack_smpl(smpl_template, smpl_t)

            vibe_out = vibe_apply(vibe_params, model, feats[:, :S], vcfg)
            boot = {k: vibe_out[k][:, :S - 1]
                    for k in ("theta", "verts", "kp_3d", "kp_2d")}

            # lane-batched fast scan — ~3x lower latency at small batch
            # (see streaming/fast_scan.py for measurements)
            scanned = fast_stream_scan(
                tepose_params, model, feats, theta_pseu, mcfg, W,
                outputs=("theta", "verts", "kp_3d", "kp_2d"))
            return {k: jnp.concatenate([boot[k], scanned[k]], axis=1)
                    for k in boot}

        self._stream_fns[key] = stream
        return stream

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
        for T_pad, idxs in buckets.items():
            B = len(idxs)
            # pad the batch axis to a power of two: bounds the number of
            # compiled (T_pad, B) programs to O(log B) per length bucket;
            # rows are independent (eval-mode BN), so pad rows are free to
            # discard
            B_pad = 1 << max(B - 1, 0).bit_length()
            feats = np.zeros((B_pad, T_pad, 2048), np.float32)
            pseu = np.zeros((B_pad, S - 1, 85), np.float32)
            pseu[:, :, 0] = 1.0
            for b, i in enumerate(idxs):
                feats[b, :len(features_list[i])] = features_list[i]
                if theta_pseu_list[i] is not None:
                    pseu[b] = theta_pseu_list[i]
            fn = self._get_stream_fn((T_pad, B_pad))
            out = fn(self._gen_flats, jnp.asarray(feats),
                     jnp.asarray(pseu))
            for b, i in enumerate(idxs):
                T = len(features_list[i])
                results[i] = {k: np.asarray(v[b, :T])
                              for k, v in out.items()}
        return results

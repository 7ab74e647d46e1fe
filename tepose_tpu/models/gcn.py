"""Multi-scale graph-convolution blocks and the GCN motion discriminator.

ref: lib/models/motion_discriminator_gcn.py, ms_gcn.py, ms_gtcn.py, mlp.py.

The discriminator scores theta *sequences* (N, T, 72) for realism (LSGAN).
Architecture (ref: motion_discriminator_gcn.py:90-166): data BN ->
3 STGC blocks, each = MS_GCN (spatial multi-scale) + MS_G3D (windowed
spatial-temporal) + 1x1 TemporalConv residual -> global average pool -> FC ->
softmax -> P(real).

Graph aggregation `einsum('vu,nctu->nctv', A, x)` maps directly onto the MXU.
BatchNorm is functional: `apply` returns (out, new_state) with updated running
stats; train mode normalises with batch statistics like torch.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tepose_tpu.models.graph import (
    multi_scale_adjacency,
    smpl_graph_binary,
    spatial_temporal_adjacency,
)

Params = Dict
State = Dict

BN_MOMENTUM = 0.1
BN_EPS = 1e-5


# ---------------------------------------------------------------- batchnorm


def bn_init(num_features: int) -> Tuple[Params, State]:
    params = {
        "weight": jnp.ones((num_features,), jnp.float32),
        "bias": jnp.zeros((num_features,), jnp.float32),
    }
    state = {
        "running_mean": jnp.zeros((num_features,), jnp.float32),
        "running_var": jnp.ones((num_features,), jnp.float32),
    }
    return params, state


def bn_apply(params: Params, state: State, x: jnp.ndarray, channel_axis: int,
             train: bool,
             row_mask: jnp.ndarray = None) -> Tuple[jnp.ndarray, State]:
    """BatchNorm over all axes except `channel_axis` (torch semantics).

    `row_mask` (N,) restricts the *statistics* to selected batch rows — the
    functional equivalent of the reference filtering rows out of the batch
    before the discriminator forward (ref: loss.py:133-136). Masked-out rows
    are still normalised (their outputs are masked away downstream).
    """
    axes = tuple(i for i in range(x.ndim) if i != channel_axis)
    shape = [1] * x.ndim
    shape[channel_axis] = x.shape[channel_axis]

    # statistics always in f32: under bf16 compute (TrainHyper.compute_dtype)
    # element counts like batch*T*V = 4608 aren't even representable in
    # bf16, and variances accumulate rounding; the normalisation itself is
    # cheap next to the convs, so only the OUTPUT drops to compute dtype.
    xf = x.astype(jnp.float32)
    if train and row_mask is not None:
        m = row_mask.astype(jnp.float32).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        per_row_elems = x.size / (x.shape[0] * x.shape[channel_axis])
        cnt = row_mask.astype(jnp.float32).sum()
        n = jnp.maximum(cnt * per_row_elems, 1.0)
        mean = (xf * m).sum(axis=axes) / n
        var = (((xf - mean.reshape(shape)) ** 2) * m).sum(axis=axes) / n
        unbiased = var * n / jnp.maximum(n - 1, 1.0)
        # all-rows-masked: the reference SKIPS the discriminator forward
        # entirely when the filtered batch is empty (ref: loss.py:137,
        # trainer.py:239 guard), so the running stats must not move —
        # blending in the masked mean=0/var=0 would decay them toward zero
        # by BN_MOMENTUM on every empty step
        any_rows = cnt > 0
        new_state = {
            "running_mean": jnp.where(
                any_rows,
                (1 - BN_MOMENTUM) * state["running_mean"]
                + BN_MOMENTUM * mean, state["running_mean"]),
            "running_var": jnp.where(
                any_rows,
                (1 - BN_MOMENTUM) * state["running_var"]
                + BN_MOMENTUM * unbiased, state["running_var"]),
        }
    elif train:
        mean = xf.mean(axis=axes)
        var = xf.var(axis=axes)  # biased, used for normalisation
        n = x.size / x.shape[channel_axis]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "running_mean": (1 - BN_MOMENTUM) * state["running_mean"]
            + BN_MOMENTUM * mean,
            "running_var": (1 - BN_MOMENTUM) * state["running_var"]
            + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["running_mean"], state["running_var"]
        new_state = state

    inv = jax.lax.rsqrt(var + BN_EPS) * params["weight"].astype(jnp.float32)
    out = (xf - mean.reshape(shape)) * inv.reshape(shape) \
        + params["bias"].astype(jnp.float32).reshape(shape)
    return out.astype(params["weight"].dtype), new_state


# ---------------------------------------------------------------- conv helpers


def _uniform(rng, shape, bound):
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def conv1x1_init(rng, in_ch: int, out_ch: int) -> Params:
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / np.sqrt(in_ch)
    return {"weight": _uniform(k1, (out_ch, in_ch), bound),
            "bias": _uniform(k2, (out_ch,), bound)}


def conv1x1(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 Conv2d over (N, C, T, V)."""
    x = x.astype(params["weight"].dtype)  # keep bf16 compute coherent
    return jnp.einsum("oc,nctv->notv", params["weight"], x) \
        + params["bias"][None, :, None, None]


def temporal_conv_init(rng, in_ch: int, out_ch: int,
                       kernel_size: int) -> Tuple[Params, State]:
    """Conv2d kernel (k, 1) + BN (ref: motion_discriminator_gcn.py:17-34)."""
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / np.sqrt(in_ch * kernel_size)
    bn_p, bn_s = bn_init(out_ch)
    params = {
        "conv": {"weight": _uniform(k1, (out_ch, in_ch, kernel_size), bound),
                 "bias": _uniform(k2, (out_ch,), bound)},
        "bn": bn_p,
    }
    return params, {"bn": bn_s}


def temporal_conv_apply(params: Params, state: State, x: jnp.ndarray,
                        train: bool, stride: int = 1, dilation: int = 1,
                        row_mask=None) -> Tuple[jnp.ndarray, State]:
    w = params["conv"]["weight"]  # (O, I, K)
    k = w.shape[-1]
    pad = (k + (k - 1) * (dilation - 1) - 1) // 2
    out = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w[..., None],  # (O, I, K, 1)
        window_strides=(stride, 1),
        padding=((pad, pad), (0, 0)),
        rhs_dilation=(dilation, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + params["conv"]["bias"][None, :, None, None]
    out, bn_s = bn_apply(params["bn"], state["bn"], out, 1, train, row_mask)
    return out, {"bn": bn_s}


# ---------------------------------------------------------------- MLP (1x1 + BN + act)


def mlp_init(rng, in_ch: int, out_chs) -> Tuple[Params, State]:
    """Stack of [Conv2d 1x1 -> BN -> act] (ref: mlp.py:8-24)."""
    params, state = {"layers": []}, {"layers": []}
    keys = jax.random.split(rng, len(out_chs))
    ch = in_ch
    for i, out_ch in enumerate(out_chs):
        bn_p, bn_s = bn_init(out_ch)
        params["layers"].append({
            "conv": conv1x1_init(keys[i], ch, out_ch), "bn": bn_p})
        state["layers"].append({"bn": bn_s})
        ch = out_ch
    return params, state


def mlp_apply(params: Params, state: State, x: jnp.ndarray, train: bool,
              activation: str = "relu",
              row_mask=None) -> Tuple[jnp.ndarray, State]:
    new_layers = []
    for lp, ls in zip(params["layers"], state["layers"]):
        x = conv1x1(lp["conv"], x)
        x, bn_s = bn_apply(lp["bn"], ls["bn"], x, 1, train, row_mask)
        if activation == "relu":
            x = jax.nn.relu(x)
        new_layers.append({"bn": bn_s})
    return x, {"layers": new_layers}


# ---------------------------------------------------------------- MS-GCN


def ms_gcn_init(rng, num_scales: int, in_ch: int, out_ch: int,
                A_binary: np.ndarray) -> Tuple[Params, State]:
    """Multi-scale spatial graph conv (ref: ms_gcn.py:14-54)."""
    k1, k2 = jax.random.split(rng)
    A_powers = multi_scale_adjacency(A_binary, num_scales)  # (S*V, V)
    mlp_p, mlp_s = mlp_init(k1, in_ch * num_scales, [out_ch])
    params = {
        "A_res": _uniform(k2, A_powers.shape, 1e-6),
        "mlp": mlp_p,
    }
    # A_powers is a constant (not trained) — carried in state for visibility.
    return params, {"A_powers": jnp.asarray(A_powers), "mlp": mlp_s}


def ms_gcn_apply(params: Params, state: State, x: jnp.ndarray,
                 num_scales: int, train: bool,
                 row_mask=None) -> Tuple[jnp.ndarray, State]:
    N, C, T, V = x.shape
    # constant adjacency follows the trained-residual dtype so bf16 compute
    # doesn't silently re-promote the whole block to f32
    A = state["A_powers"].astype(params["A_res"].dtype) + params["A_res"]
    support = jnp.einsum("vu,nctu->nctv", A, x)  # (N, C, T, S*V)
    support = support.reshape(N, C, T, num_scales, V)
    support = jnp.moveaxis(support, 3, 1).reshape(N, num_scales * C, T, V)
    out, mlp_s = mlp_apply(params["mlp"], state["mlp"], support, train,
                           row_mask=row_mask)
    return out, {"A_powers": state["A_powers"], "mlp": mlp_s}


# ---------------------------------------------------------------- MS-G3D


def unfold_temporal_windows(x: jnp.ndarray, window_size: int,
                            window_stride: int = 1,
                            window_dilation: int = 1) -> jnp.ndarray:
    """(N, C, T, V) -> (N, C, T', window*V) sliding temporal windows.

    ref: ms_gtcn.py:14-34 (nn.Unfold with kernel (w, 1)).
    """
    N, C, T, V = x.shape
    pad = (window_size + (window_size - 1) * (window_dilation - 1) - 1) // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    Tp = T + 2 * pad
    eff = (window_size - 1) * window_dilation + 1
    Tout = (Tp - eff) // window_stride + 1
    # windows stacked on a new axis: (N, C, window, T', V)
    slices = [
        xp[:, :, w * window_dilation: w * window_dilation
           + Tout * window_stride: window_stride, :]
        for w in range(window_size)
    ]
    stacked = jnp.stack(slices, axis=2)
    # (N, C, T', window, V) -> (N, C, T', window*V)
    stacked = jnp.moveaxis(stacked, 2, 3)
    return stacked.reshape(N, C, Tout, window_size * V)


def st_ms_gcn_init(rng, in_ch: int, out_ch: int, A_binary: np.ndarray,
                   num_scales: int, window_size: int) -> Tuple[Params, State]:
    """Spatial-temporal multi-scale GCN over the unfolded window graph.

    ref: ms_gtcn.py:37-107 (use_Ares=True, residual=False, mlp act linear,
    output act relu).
    """
    k1, k2 = jax.random.split(rng)
    A_large = spatial_temporal_adjacency(A_binary, window_size)
    A_scales = multi_scale_adjacency(A_large, num_scales)
    mlp_p, mlp_s = mlp_init(k1, in_ch * num_scales, [out_ch])
    params = {"A_res": _uniform(k2, A_scales.shape, 1e-6), "mlp": mlp_p}
    return params, {"A_scales": jnp.asarray(A_scales), "mlp": mlp_s}


def st_ms_gcn_apply(params: Params, state: State, x: jnp.ndarray,
                    num_scales: int, train: bool,
                    row_mask=None) -> Tuple[jnp.ndarray, State]:
    N, C, T, WV = x.shape
    A = state["A_scales"].astype(params["A_res"].dtype) + params["A_res"]
    agg = jnp.einsum("vu,nctu->nctv", A, x)
    agg = agg.reshape(N, C, T, num_scales, WV)
    agg = jnp.moveaxis(agg, 3, 1).reshape(N, num_scales * C, T, WV)
    out, mlp_s = mlp_apply(params["mlp"], state["mlp"], agg, train,
                           activation="linear", row_mask=row_mask)
    out = jax.nn.relu(out)
    return out, {"A_scales": state["A_scales"], "mlp": mlp_s}


def ms_g3d_init(rng, in_ch: int, out_ch: int, A_binary: np.ndarray,
                num_scales: int,
                window_size: int = 3) -> Tuple[Params, State]:
    """MS-G3D pathway (ref: motion_discriminator_gcn.py:36-87, embed_factor=1:
    identity in-projection; first block (in=3) embeds to out_ch inside the
    ST-GCN, later blocks keep channels and embed in the collapse conv)."""
    embed_out = out_ch if in_ch == 3 else in_ch
    k1, k2, k3 = jax.random.split(rng, 3)
    st_p, st_s = st_ms_gcn_init(k1, in_ch, embed_out, A_binary, num_scales,
                                window_size)
    bound = 1.0 / np.sqrt(embed_out * window_size)
    bn_p, bn_s = bn_init(out_ch)
    params = {
        "st": st_p,
        # Conv3d kernel (1, window, 1): contraction over (C_embed, window)
        "out_conv": {
            "weight": _uniform(k2, (out_ch, embed_out, window_size), bound),
            "bias": _uniform(k3, (out_ch,), bound),
        },
        "out_bn": bn_p,
    }
    return params, {"st": st_s, "out_bn": bn_s}


def ms_g3d_apply(params: Params, state: State, x: jnp.ndarray,
                 num_scales: int, window_size: int, train: bool,
                 row_mask=None) -> Tuple[jnp.ndarray, State]:
    N, C, T, V = x.shape
    xw = unfold_temporal_windows(x, window_size)
    out, st_s = st_ms_gcn_apply(params["st"], state["st"], xw, num_scales,
                                train, row_mask=row_mask)
    emb = out.shape[1]
    Tw = out.shape[2]
    out = out.reshape(N, emb, Tw, window_size, V)
    out = out.astype(params["out_conv"]["weight"].dtype)
    out = jnp.einsum("ocw,nctwv->notv", params["out_conv"]["weight"], out) \
        + params["out_conv"]["bias"][None, :, None, None]
    out, bn_s = bn_apply(params["out_bn"], state["out_bn"], out, 1, train,
                         row_mask)
    return out, {"st": st_s, "out_bn": bn_s}


# ---------------------------------------------------------------- discriminator


def motion_discriminator_init(
    rng, num_class: int = 2, num_point: int = 24, in_channels: int = 3,
    num_gcn_scales: int = 13, num_g3d_scales: int = 6,
) -> Tuple[Params, State]:
    """ref: motion_discriminator_gcn.py:90-135, config.py:86-92."""
    A_binary = smpl_graph_binary()
    c1, c2, c3 = 64, 128, 256
    keys = jax.random.split(rng, 10)
    params: Params = {}
    state: State = {}

    bn_p, bn_s = bn_init(num_point * in_channels)
    params["data_bn"], state["data_bn"] = bn_p, bn_s

    dims = [(in_channels, c1), (c1, c2), (c2, c3)]
    for i, (ci, co) in enumerate(dims, start=1):
        g3d_p, g3d_s = ms_g3d_init(keys[3 * i - 3], ci, co, A_binary,
                                   num_g3d_scales)
        gcn_p, gcn_s = ms_gcn_init(keys[3 * i - 2], num_gcn_scales, ci, co,
                                   A_binary)
        res_p, res_s = temporal_conv_init(keys[3 * i - 1], ci, co, 1)
        params[f"gcn3d{i}"], state[f"gcn3d{i}"] = g3d_p, g3d_s
        params[f"sgcn{i}"], state[f"sgcn{i}"] = gcn_p, gcn_s
        params[f"residual_{i}"], state[f"residual_{i}"] = res_p, res_s

    kfc1, kfc2 = jax.random.split(keys[9])
    bound = 1.0 / np.sqrt(c3)
    params["fc"] = {"weight": _uniform(kfc1, (num_class, c3), bound),
                    "bias": _uniform(kfc2, (num_class,), bound)}
    return params, state


def motion_discriminator_apply(
    params: Params, state: State, x: jnp.ndarray, *,
    num_point: int = 24, in_channels: int = 3,
    num_gcn_scales: int = 13, num_g3d_scales: int = 6,
    window_size: int = 3, train: bool = False, row_mask=None,
) -> Tuple[jnp.ndarray, State]:
    """x: (N, T, 72) pose sequences -> (N,) real-probability.

    ref: motion_discriminator_gcn.py:137-166. `row_mask` (N,) restricts all
    BatchNorm statistics to the selected rows (see bn_apply).
    """
    N, T, _ = x.shape
    new_state: State = {}

    xt = jnp.swapaxes(x, 1, 2)  # (N, V*C, T)
    xt, new_state["data_bn"] = bn_apply(params["data_bn"], state["data_bn"],
                                        xt, 1, train, row_mask)
    # (N, V, C, T) -> (N, C, T, V)
    xt = xt.reshape(N, num_point, in_channels, T).transpose(0, 2, 3, 1)

    h = xt
    for i in (1, 2, 3):
        res, new_state[f"residual_{i}"] = temporal_conv_apply(
            params[f"residual_{i}"], state[f"residual_{i}"], h, train,
            row_mask=row_mask)
        g3d, new_state[f"gcn3d{i}"] = ms_g3d_apply(
            params[f"gcn3d{i}"], state[f"gcn3d{i}"], h, num_g3d_scales,
            window_size, train, row_mask=row_mask)
        sg, new_state[f"sgcn{i}"] = ms_gcn_apply(
            params[f"sgcn{i}"], state[f"sgcn{i}"], h, num_gcn_scales, train,
            row_mask=row_mask)
        h = jax.nn.relu(sg + g3d)
        h = h + res
        h = jax.nn.relu(h)

    out = h.reshape(N, h.shape[1], -1).mean(axis=2)  # GAP over (T, V)
    logits = out @ params["fc"]["weight"].T + params["fc"]["bias"]
    probs = jax.nn.softmax(logits, axis=1)
    return probs[:, 0], new_state

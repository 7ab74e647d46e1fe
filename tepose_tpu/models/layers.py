"""Parameterised layers as pure functions over pytree params.

Convention: parameters are nested dicts of jnp arrays whose keys and layouts
mirror the PyTorch state_dict of the reference models, so converted checkpoints
drop in directly:

  * Linear:  {"weight": (out, in), "bias": (out,)}; y = x @ W^T + b
  * GRU:     {"weight_ih_l{k}", "weight_hh_l{k}", "bias_ih_l{k}",
              "bias_hh_l{k}"} (+ "_reverse" twins when bidirectional), each
              weight (3H, in) with gate order (r, z, n) — torch's layout.

The GRU time loop is a `lax.scan` over the sequence axis; the per-step cell is
two MXU matmuls + VPU gate math, which XLA fuses. Batch stays the fast axis so
multi-chip sharding along batch never crosses the scan carry.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------- linear


def linear_init(rng: jax.Array, in_dim: int, out_dim: int,
                w_scale: Optional[float] = None) -> Params:
    """Torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for W and b.

    If `w_scale` is given, use Xavier-uniform with that gain for the weight
    (the reference uses gain=0.01 for the regressor heads, ref: spin.py:222).
    """
    k_w, k_b = jax.random.split(rng)
    bound = 1.0 / np.sqrt(in_dim)
    if w_scale is None:
        w = jax.random.uniform(k_w, (out_dim, in_dim), jnp.float32,
                               -bound, bound)
    else:
        limit = w_scale * np.sqrt(6.0 / (in_dim + out_dim))
        w = jax.random.uniform(k_w, (out_dim, in_dim), jnp.float32,
                               -limit, limit)
    b = jax.random.uniform(k_b, (out_dim,), jnp.float32, -bound, bound)
    return {"weight": w, "bias": b}


def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["weight"].T + params["bias"]


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float,
            train: bool) -> jnp.ndarray:
    """Inverted dropout matching torch semantics (scale by 1/(1-p) at train)."""
    if not train or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ---------------------------------------------------------------- GRU


def _gru_dir_init(rng: jax.Array, in_dim: int, hidden: int) -> Params:
    k = 1.0 / np.sqrt(hidden)
    ks = jax.random.split(rng, 4)
    return {
        "weight_ih": jax.random.uniform(ks[0], (3 * hidden, in_dim),
                                        jnp.float32, -k, k),
        "weight_hh": jax.random.uniform(ks[1], (3 * hidden, hidden),
                                        jnp.float32, -k, k),
        "bias_ih": jax.random.uniform(ks[2], (3 * hidden,), jnp.float32, -k, k),
        "bias_hh": jax.random.uniform(ks[3], (3 * hidden,), jnp.float32, -k, k),
    }


def gru_init(rng: jax.Array, input_size: int, hidden_size: int,
             num_layers: int = 1, bidirectional: bool = False) -> Params:
    """Init a (possibly multi-layer, bidirectional) GRU, torch key naming."""
    params: Params = {}
    num_dirs = 2 if bidirectional else 1
    keys = jax.random.split(rng, num_layers * num_dirs)
    i = 0
    for layer in range(num_layers):
        in_dim = input_size if layer == 0 else hidden_size * num_dirs
        for d in range(num_dirs):
            sub = _gru_dir_init(keys[i], in_dim, hidden_size)
            i += 1
            suffix = f"l{layer}" + ("_reverse" if d == 1 else "")
            for name, val in sub.items():
                params[f"{name}_{suffix}"] = val
    return params


def _gru_cell(x_proj: jnp.ndarray, h: jnp.ndarray, w_hh: jnp.ndarray,
              b_hh: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """One GRU step given the precomputed input projection.

    Torch gate math (gate order r, z, n):
      r = sigmoid(Wir x + bir + Whr h + bhr)
      z = sigmoid(Wiz x + biz + Whz h + bhz)
      n = tanh  (Win x + bin + r * (Whn h + bhn))
      h' = (1 - z) * n + z * h
    """
    h_proj = h @ w_hh.T + b_hh
    xr, xz, xn = (x_proj[..., :hidden], x_proj[..., hidden:2 * hidden],
                  x_proj[..., 2 * hidden:])
    hr, hz, hn = (h_proj[..., :hidden], h_proj[..., hidden:2 * hidden],
                  h_proj[..., 2 * hidden:])
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _gru_single(params: Params, suffix: str, x: jnp.ndarray,
                reverse: bool) -> jnp.ndarray:
    """Run one direction of one layer. x: (T, B, F) -> (T, B, H)."""
    w_ih = params[f"weight_ih_{suffix}"]
    w_hh = params[f"weight_hh_{suffix}"]
    b_ih = params[f"bias_ih_{suffix}"]
    b_hh = params[f"bias_hh_{suffix}"]
    hidden = w_hh.shape[1]

    # Hoist the input projection out of the scan: one big (T*B, F)x(F, 3H)
    # matmul on the MXU instead of T small ones.
    x_proj = x @ w_ih.T + b_ih

    def step(h, xp):
        h_new = _gru_cell(xp, h, w_hh, b_hh, hidden)
        return h_new, h_new

    h0 = jnp.zeros((x.shape[1], hidden), x.dtype)
    _, ys = jax.lax.scan(step, h0, x_proj, reverse=reverse)
    return ys


def gru_apply(params: Params, x: jnp.ndarray, num_layers: int = 1,
              bidirectional: bool = False) -> jnp.ndarray:
    """Multi-layer GRU. x: (T, B, F) -> (T, B, H * num_dirs).

    Matches torch nn.GRU output semantics (zero initial state, outputs of the
    last layer; for bidirectional, forward and backward concatenated on the
    feature axis with the backward pass running over the reversed sequence).
    """
    y = x
    for layer in range(num_layers):
        fwd = _gru_single(params, f"l{layer}", y, reverse=False)
        if bidirectional:
            bwd = _gru_single(params, f"l{layer}_reverse", y, reverse=True)
            y = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            y = fwd
    return y

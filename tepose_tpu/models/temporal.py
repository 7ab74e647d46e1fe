"""Temporal encoders: TePose dual-GRU and VIBE residual-GRU.

ref: lib/models/tepose.py:44-87 (TemporalEncoder), lib/models/vibe.py:27-63
(VIBE TemporalEncoder). Time recursion is a `lax.scan` inside
`layers.gru_apply`; sequences are seq-first (T, B, F) internally to match the
scan axis, batch-first (B, T, F) at the API boundary like the reference.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from tepose_tpu.models import layers as L

INPUT_DIM = 2048 + 85  # features + theta feedback (ref: tepose.py:54)


def temporal_attention_init(rng: jax.Array, attention_size: int,
                            seq_len: int) -> Dict:
    """Soft temporal attention scorer (ref: tepose.py:11-41).

    NOTE: defined but UNUSED by the reference's forward pass — provided for
    checkpoint/API parity only.
    """
    ks = jax.random.split(rng, 4)
    return {
        "fc": L.linear_init(ks[0], attention_size, 256),
        "attention": [
            L.linear_init(ks[1], 256 * seq_len, 256),
            L.linear_init(ks[2], 256, 256),
            L.linear_init(ks[3], 256, seq_len),
        ],
    }


def temporal_attention_apply(params: Dict, x: jnp.ndarray,
                             non_linearity: str = "tanh") -> jnp.ndarray:
    """x (B, T, F) -> per-frame attention scores (B, T)."""
    act = jnp.tanh if non_linearity == "tanh" else jax.nn.relu
    B = x.shape[0]
    h = L.linear(params["fc"], x).reshape(B, -1)
    for lin in params["attention"]:
        h = act(L.linear(lin, h))
    return jax.nn.softmax(h, axis=-1)


def temporal_encoder_init(rng: jax.Array, n_layers: int = 1,
                          hidden_size: int = 2048,
                          input_size: int = INPUT_DIM) -> Dict:
    """TePose encoder: unidirectional `gru_fwd` + bidirectional `gru_rec`
    over the time-flipped window, each followed by a linear to 2048.

    ref: tepose.py:44-69.
    """
    ks = jax.random.split(rng, 4)
    return {
        "gru_fwd": L.gru_init(ks[0], input_size, hidden_size, n_layers,
                              bidirectional=False),
        "gru_rec": L.gru_init(ks[1], input_size, hidden_size, n_layers,
                              bidirectional=True),
        "linear_fwd": L.linear_init(ks[2], hidden_size, 2048),
        "linear_rec": L.linear_init(ks[3], hidden_size * 2, 2048),
    }


def temporal_encoder_apply(params: Dict, x: jnp.ndarray, n_layers: int = 1,
                           train: bool = False) -> jnp.ndarray:
    """x: (B, T, F) -> eval (B, 2048) | train (B, 2, 2048).

    ref: tepose.py:71-87 — `gru_fwd` reads the window forward and emits the
    last step; `gru_rec` reads the *flipped* window bidirectionally and emits
    its first step. Eval averages the two branches; train stacks them (the
    "fwd" and "rec" repeats the loss supervises separately).
    """
    xt = jnp.swapaxes(x, 0, 1)  # (T, B, F)

    y_fwd_seq = L.gru_apply(params["gru_fwd"], xt, n_layers,
                            bidirectional=False)
    y_fwd = L.linear(params["linear_fwd"], jax.nn.relu(y_fwd_seq[-1]))

    x_rec = jnp.flip(xt, axis=0)
    y_rec_seq = L.gru_apply(params["gru_rec"], x_rec, n_layers,
                            bidirectional=True)
    y_rec = L.linear(params["linear_rec"], jax.nn.relu(y_rec_seq[0]))

    if not train:
        return (y_fwd + y_rec) / 2.0
    return jnp.stack([y_fwd, y_rec], axis=1)


def vibe_encoder_init(rng: jax.Array, n_layers: int = 1,
                      hidden_size: int = 2048, add_linear: bool = False,
                      bidirectional: bool = False) -> Dict:
    """VIBE encoder: GRU (+ optional linear) with residual to the input.

    ref: vibe.py:27-50.
    """
    ks = jax.random.split(rng, 2)
    params: Dict = {
        "gru": L.gru_init(ks[0], 2048, hidden_size, n_layers, bidirectional),
    }
    if bidirectional:
        params["linear"] = L.linear_init(ks[1], hidden_size * 2, 2048)
    elif add_linear:
        params["linear"] = L.linear_init(ks[1], hidden_size, 2048)
    return params


def vibe_encoder_apply(params: Dict, x: jnp.ndarray, n_layers: int = 1,
                        bidirectional: bool = False,
                        use_residual: bool = True) -> jnp.ndarray:
    """x: (B, T, 2048) -> (B, T, 2048). ref: vibe.py:52-63."""
    xt = jnp.swapaxes(x, 0, 1)
    y = L.gru_apply(params["gru"], xt, n_layers, bidirectional)
    if "linear" in params:
        y = L.linear(params["linear"], jax.nn.relu(y))
    if use_residual and y.shape[-1] == 2048:
        y = y + xt
    return jnp.swapaxes(y, 0, 1)

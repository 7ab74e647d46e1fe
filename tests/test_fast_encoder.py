"""Equivalence of the optimised streaming encoder vs the reference-shaped
temporal encoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tepose_tpu.models.fast_encoder import (
    fast_encoder_window, pack_fast_encoder, project_frame_features)
from tepose_tpu.models.temporal import (
    temporal_encoder_init, temporal_encoder_apply)


@pytest.mark.parametrize("n_layers", [1, 2, 3])
def test_fast_encoder_matches_reference(rng, n_layers):
    hidden, S, B = 48, 6, 4
    enc = temporal_encoder_init(jax.random.PRNGKey(0), n_layers, hidden)
    fast = pack_fast_encoder(enc, n_layers)

    feats = rng.randn(B, S, 2048).astype(np.float32) * 0.3
    thetas = rng.randn(B, S, 85).astype(np.float32) * 0.3
    thetas[:, -1] = 0.0  # last frame carries no feedback, like the real input
    x = np.concatenate([feats, thetas], axis=-1)

    ref_eval = np.asarray(temporal_encoder_apply(enc, jnp.asarray(x),
                                                 n_layers))
    ref_train = np.asarray(temporal_encoder_apply(enc, jnp.asarray(x),
                                                  n_layers, train=True))

    fp = project_frame_features(fast, jnp.asarray(feats))   # (B, S, 3, 3H)
    ours_eval = np.asarray(fast_encoder_window(fast, fp, jnp.asarray(thetas)))
    ours_train = np.asarray(fast_encoder_window(fast, fp,
                                                jnp.asarray(thetas),
                                                train=True))

    np.testing.assert_allclose(ours_eval, ref_eval, atol=3e-5)
    np.testing.assert_allclose(ours_train, ref_train, atol=3e-5)


def test_fast_encoder_jit(rng):
    enc = temporal_encoder_init(jax.random.PRNGKey(1), 2, 32)
    fast = pack_fast_encoder(enc, 2)
    feats = jnp.asarray(rng.randn(2, 6, 2048).astype(np.float32) * 0.1)
    thetas = jnp.asarray(rng.randn(2, 6, 85).astype(np.float32) * 0.1)

    @jax.jit
    def f(fast, feats, thetas):
        fp = project_frame_features(fast, feats)
        return fast_encoder_window(fast, fp, thetas)

    out = f(fast, feats, thetas)
    assert out.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(out)))

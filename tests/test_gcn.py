"""Tests for the GCN motion discriminator building blocks."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from tepose_tpu.models import gcn as G
from tepose_tpu.models.graph import (
    k_adjacency, multi_scale_adjacency, normalize_adjacency,
    smpl_graph_binary, spatial_temporal_adjacency)


def test_smpl_graph_shape():
    A = smpl_graph_binary()
    assert A.shape == (24, 24)
    assert np.all(A == A.T)  # inward + outward edges -> symmetric
    assert A.sum() == 2 * 23  # 23 bones, both directions
    assert np.all(np.diag(A) == 0)


def test_k_adjacency_properties():
    A = smpl_graph_binary()
    I = np.eye(24)
    np.testing.assert_array_equal(k_adjacency(A, 0), I)
    # k=1 with self: the adjacency itself + I
    np.testing.assert_array_equal(k_adjacency(A, 1, with_self=True), A + I)
    # exact 2-hop: no overlap with 1-hop or self
    A2 = k_adjacency(A, 2)
    assert np.all(A2 * (A + I) == 0)


def test_multi_scale_adjacency_shape():
    A = smpl_graph_binary()
    ms = multi_scale_adjacency(A, 13)
    assert ms.shape == (13 * 24, 24)
    st = spatial_temporal_adjacency(A, 3)
    assert st.shape == (72, 72)


def test_normalize_adjacency_matches_formula():
    A = smpl_graph_binary() + np.eye(24, dtype=np.float32)
    norm = normalize_adjacency(A)
    deg = A.sum(-1)
    expected = A / np.sqrt(np.outer(deg, deg))
    np.testing.assert_allclose(norm, expected, atol=1e-6)


def test_unfold_matches_torch(rng):
    x = rng.randn(2, 5, 7, 24).astype(np.float32)
    for window, dilation in [(3, 1), (3, 2), (5, 1)]:
        ours = np.asarray(G.unfold_temporal_windows(
            jnp.asarray(x), window, 1, dilation))
        pad = (window + (window - 1) * (dilation - 1) - 1) // 2
        unfold = nn.Unfold(kernel_size=(window, 1), dilation=(dilation, 1),
                           stride=(1, 1), padding=(pad, 0))
        xt = torch.from_numpy(x)
        ref = unfold(xt)
        N, C, T, V = x.shape
        ref = ref.view(N, C, window, -1, V).permute(0, 1, 3, 2, 4)
        ref = ref.reshape(N, C, -1, window * V).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6, err_msg=f"w={window}")


def test_bn_matches_torch(rng):
    x = rng.randn(4, 8, 6, 24).astype(np.float32)
    params, state = G.bn_init(8)
    tbn = nn.BatchNorm2d(8)

    # train step
    ours, new_state = G.bn_apply(params, state, jnp.asarray(x), 1, train=True)
    ref = tbn(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["running_mean"]),
                               tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["running_var"]),
                               tbn.running_var.numpy(), atol=1e-4)

    # eval uses running stats
    tbn.eval()
    ours_e, _ = G.bn_apply(params, new_state, jnp.asarray(x), 1, train=False)
    ref_e = tbn(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours_e), ref_e.detach().numpy(),
                               atol=1e-5)


def test_bn_all_masked_rows_keep_running_stats(rng):
    """An all-zero row_mask must leave the running stats untouched: the
    reference SKIPS the discriminator forward when the filtered batch is
    empty (ref: loss.py:137, trainer.py:239), so the stats never see an
    empty batch there — blending in the masked mean=0/var=0 would decay
    them toward zero by BN_MOMENTUM on every empty scan step."""
    x = rng.randn(4, 8, 6, 24).astype(np.float32)
    params, state = G.bn_init(8)
    state = {"running_mean": state["running_mean"] + 2.0,
             "running_var": state["running_var"] + 3.0}

    _, st0 = G.bn_apply(params, state, jnp.asarray(x), 1, train=True,
                        row_mask=jnp.zeros((4,)))
    np.testing.assert_array_equal(np.asarray(st0["running_mean"]),
                                  np.asarray(state["running_mean"]))
    np.testing.assert_array_equal(np.asarray(st0["running_var"]),
                                  np.asarray(state["running_var"]))

    # a non-empty mask must still update (sanity that the fix is gated)
    _, st1 = G.bn_apply(params, state, jnp.asarray(x), 1, train=True,
                        row_mask=jnp.asarray([1.0, 1.0, 0.0, 0.0]))
    assert not np.allclose(np.asarray(st1["running_mean"]),
                           np.asarray(state["running_mean"]))


def test_temporal_conv_matches_torch(rng):
    x = rng.randn(2, 3, 6, 24).astype(np.float32)
    params, state = G.temporal_conv_init(jax.random.PRNGKey(0), 3, 16, 1)
    conv = nn.Conv2d(3, 16, kernel_size=(1, 1))
    conv.load_state_dict({
        "weight": torch.from_numpy(
            np.asarray(params["conv"]["weight"]))[..., None],
        "bias": torch.from_numpy(np.asarray(params["conv"]["bias"]))})
    ours, _ = G.temporal_conv_apply(params, state, jnp.asarray(x), train=True)
    bn = nn.BatchNorm2d(16)
    ref = bn(conv(torch.from_numpy(x)))
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                               atol=1e-4)


def test_discriminator_forward_and_grad(rng):
    params, state = G.motion_discriminator_init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(4, 6, 72).astype(np.float32) * 0.3)

    probs, new_state = G.motion_discriminator_apply(params, state, x,
                                                    train=True)
    assert probs.shape == (4,)
    p = np.asarray(probs)
    assert np.all((p >= 0) & (p <= 1))
    assert np.all(np.isfinite(p))

    # LSGAN-style loss gradient must be finite through the whole stack
    def loss_fn(prm):
        pr, _ = G.motion_discriminator_apply(prm, state, x, train=True)
        return jnp.mean((pr - 1.0) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # and gradients actually reach the first block
    gnorm = sum(float(jnp.abs(l).sum()) for l in
                jax.tree_util.tree_leaves(g["sgcn1"]))
    assert gnorm > 0


def test_discriminator_jit(rng):
    params, state = G.motion_discriminator_init(jax.random.PRNGKey(1))
    f = jax.jit(lambda p, s, x: G.motion_discriminator_apply(p, s, x,
                                                             train=False))
    x = jnp.asarray(rng.randn(2, 6, 72).astype(np.float32))
    probs, _ = f(params, state, x)
    assert probs.shape == (2,)

"""Procrustes / similarity-transform alignment (the PA in PA-MPJPE).

ref: lib/utils/eval_utils.py:178-337 (compute_similarity_transform,
batch_compute_similarity_transform_torch). SVD-based orthogonal Procrustes with
reflection fix and scale/translation recovery.

TPU note (SURVEY.md §7): `jnp.linalg.svd` compiles on TPU but is slower / less
accurate than on CPU. PA-MPJPE is eval-only, so callers may run this under
`jax.default_device(cpu)` or on host numpy; the function itself is pure jnp and
works under jit on any backend.
"""

from __future__ import annotations

import jax.numpy as jnp


def similarity_transform(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    """Align point set S1 (N, 3) to S2 (N, 3) by similarity transform (s, R, t).

    Returns S1_hat = s * R @ S1 + t in the same (N, 3) layout.
    ref: eval_utils.py:178 (points arrive row-major and are transposed inside).
    """
    return batch_similarity_transform(S1[None], S2[None])[0]


def batch_similarity_transform(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    """Batched Procrustes: S1, S2 are (B, N, 3); returns aligned S1_hat (B, N, 3).

    ref: eval_utils.py:287 (batch_compute_similarity_transform_torch). The
    torch code works with (B, 3, N); we keep the same math with einsum.
    """
    X1 = jnp.swapaxes(S1, -1, -2)  # (B, 3, N)
    X2 = jnp.swapaxes(S2, -1, -2)

    mu1 = X1.mean(axis=-1, keepdims=True)
    mu2 = X2.mean(axis=-1, keepdims=True)
    X1c = X1 - mu1
    X2c = X2 - mu2

    var1 = jnp.sum(X1c ** 2, axis=(-1, -2))  # (B,)

    K = jnp.einsum("bin,bjn->bij", X1c, X2c)  # (B, 3, 3)

    # torch.svd returns (U, S, V) with K = U diag(S) V^T;
    # jnp.linalg.svd returns (U, S, Vh) with Vh = V^T.
    U, _, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, -1, -2)

    # Fix reflection so det(R) = 1.
    Z = jnp.broadcast_to(jnp.eye(3, dtype=S1.dtype), K.shape).copy()
    det = jnp.linalg.det(jnp.einsum("bij,bkj->bik", U, V))  # det(U V^T)
    Z = Z.at[:, -1, -1].multiply(jnp.sign(det))

    R = jnp.einsum("bij,bjk,blk->bil", V, Z, U)  # V @ Z @ U^T

    trace_RK = jnp.einsum("bij,bji->b", R, K)
    scale = trace_RK / var1  # (B,)

    t = mu2 - scale[:, None, None] * jnp.einsum("bij,bjk->bik", R, mu1)

    S1_hat = scale[:, None, None] * jnp.einsum("bij,bjn->bin", R, X1) + t
    return jnp.swapaxes(S1_hat, -1, -2)

"""Pallas TPU kernel for the LBS skinning stage of the SMPL forward.

The stock XLA path (models.smpl.smpl_forward step 5) materialises the
per-vertex transform tensor T = lbs_weights @ rel_transforms with shape
(B, V, 4, 4) in HBM before contracting it with the posed vertices. This
kernel fuses the two contractions: per (batch row, vertex block) grid cell it
computes the (16, BLOCK_V) transform block on the MXU and immediately applies
it to the vertices in VMEM — T never leaves the chip.

Layout note: TPU tiles the last two dims to (8, 128), so the vertex axis must
be the minor (lane) dimension — an early (B, V, 4) layout padded 4 -> 128
lanes and blew memory up 32x. Everything here is (rows, V) with V padded to a
multiple of BLOCK_V (SMPL's 6890 -> 7168).

Measured (v5e, B=256, 16 chained full SMPL forwards, synced): XLA einsum
path 0.59 ms/call vs this kernel 1.04 ms/call — stock XLA already fuses the
skinning chain better than the hand-written kernel (as anticipated in
SURVEY.md §7 stage 2), so the kernel stays opt-in
(`smpl_forward(..., skinning="pallas")`), bit-identical to the einsum path,
as the template for future SMPL fusion work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_V = 512


def _skin_kernel(wt_ref, a_ref, v_ref, out_ref):
    """One (batch, vertex-block) cell.

    wt_ref: (24, BLOCK_V) lbs weights block (transposed)
    a_ref:  (1, 16, 24) this sample's joint transforms, component-major
    v_ref:  (1, 4, BLOCK_V) posed vertices (homogeneous rows x, y, z, 1)
    out_ref:(1, 4, BLOCK_V) skinned vertices (rows x, y, z, w)
    """
    # per-vertex transforms: (16, BLOCK_V) on the MXU
    t = jnp.dot(a_ref[0], wt_ref[:, :], preferred_element_type=jnp.float32)
    v = v_ref[0]  # (4, BLOCK_V)
    rows = []
    for i in range(4):
        acc = (t[4 * i + 0] * v[0] + t[4 * i + 1] * v[1]
               + t[4 * i + 2] * v[2] + t[4 * i + 3])
        rows.append(acc)
    out_ref[0] = jnp.stack(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lbs_skinning_pallas(lbs_weights: jnp.ndarray, rel_tf: jnp.ndarray,
                        v_posed: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused LBS skinning: verts = (W @ A) . [v, 1].

    lbs_weights (V, J); rel_tf (B, J, 4, 4); v_posed (B, V, 3) -> (B, V, 3).
    """
    B, J = rel_tf.shape[:2]
    V = lbs_weights.shape[0]
    V_pad = -(-V // BLOCK_V) * BLOCK_V

    wt = jnp.zeros((J, V_pad), lbs_weights.dtype).at[:, :V].set(
        lbs_weights.T)
    # a[b, 16, J]: component-major so T = a @ wT is (16, V) per sample
    a = jnp.swapaxes(rel_tf.reshape(B, J, 16), 1, 2)
    v = jnp.concatenate(
        [jnp.swapaxes(v_posed, 1, 2),
         jnp.ones((B, 1, V), v_posed.dtype)], axis=1)          # (B, 4, V)
    v = jnp.zeros((B, 4, V_pad), v.dtype).at[:, :, :V].set(v)

    grid = (B, V_pad // BLOCK_V)
    out = pl.pallas_call(
        _skin_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 4, V_pad), v_posed.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((J, BLOCK_V), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, J), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, BLOCK_V), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, BLOCK_V), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(wt, a, v)
    return jnp.swapaxes(out[:, :3, :V], 1, 2)

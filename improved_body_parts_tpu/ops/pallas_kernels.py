"""Pallas TPU kernels for the inference hot path.

``nms_pallas``: fused 3x3 max-pool NMS + threshold + suppression in one
VMEM-resident pass per (batch, channel) heatmap tile — replaces the XLA
reduce_window + compare + select chain (ops/peaks.py:heatmap_nms, itself
the TPU redesign of the reference's GPU max-pool NMS, utils/util.py:177-185).

The reference reflect-pads before max-pooling; for a local-max test the
reflected neighbour is already inside the window, so treating out-of-bounds
as -inf is mathematically identical — the kernel uses shifted VMEM slices
of a -inf-padded tile.

Falls back transparently to the XLA implementation off-TPU (tests run both
in Pallas interpret mode and compare).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(thre_ref, heat_ref, out_ref):
    """One (H, W) heatmap tile: suppress non-local-maxima and sub-threshold."""
    x = heat_ref[0]                                   # (H, W) in VMEM
    h, w = x.shape
    neg = jnp.float32(-jnp.inf)
    padded = jnp.pad(x, 1, mode="constant", constant_values=neg)
    hmax = x
    # 8-neighbour max via static shifted slices (VPU work, no gathers)
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            hmax = jnp.maximum(hmax, padded[dy:dy + h, dx:dx + w])
    thre = thre_ref[0, 0]
    keep = (x >= hmax) & (x >= thre)
    out_ref[0] = jnp.where(keep, x, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nms_pallas(heat: jnp.ndarray, thre: float = 0.1,
               interpret: bool = False) -> jnp.ndarray:
    """heat: (..., H, W) -> NMS'd maps (same shape).

    Grid: one program per leading-dims tile; each holds its (H, W) map in
    VMEM (128x128 fp32 = 64 KB) and does 8 shifted max compares.
    """
    lead = heat.shape[:-2]
    h, w = heat.shape[-2:]
    flat = heat.reshape((-1, h, w)).astype(jnp.float32)
    n = flat.shape[0]
    thre_arr = jnp.full((1, 1), thre, jnp.float32)

    out = pl.pallas_call(
        _nms_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        interpret=interpret,
    )(thre_arr, flat)
    return out.reshape(lead + (h, w)).astype(heat.dtype)


def nms(heat: jnp.ndarray, thre: float = 0.1) -> jnp.ndarray:
    """Backend-dispatching NMS: Pallas on TPU, XLA elsewhere."""
    from improved_body_parts_tpu.ops.peaks import heatmap_nms
    if jax.default_backend() == "tpu":
        return nms_pallas(heat, thre)
    return heatmap_nms(heat, thre)

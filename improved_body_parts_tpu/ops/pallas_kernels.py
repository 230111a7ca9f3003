"""Pallas TPU kernels for the inference hot path.

``nms_pallas``: fused max-pool NMS + threshold + suppression in one
VMEM-resident pass per (batch, channel) heatmap tile — replaces the XLA
reduce_window/shift + compare + select chain (ops/peaks.py:heatmap_nms).
Both reference footprints are supported:

  * "plus" — 4-neighbourhood, strict ``> thre``: scipy
    ``maximum_filter(img, generate_binary_structure(2, 1))`` as used by the
    refactored 66.1-AP path (utils/parse_skeletons.py:106-119). scipy's
    'reflect' border pads a radius-1 plus window with the centre pixel
    itself, so -inf padding is mathematically identical.
  * "square" — 3x3 window, ``>= thre``: the original GPU max-pool path
    (utils/util.py:177-185). The reference reflect-pads, but the reflected
    neighbour is already inside a 3x3 window, so -inf padding is identical
    here too.

Falls back transparently to the XLA implementation off-TPU (tests run both
in Pallas interpret mode and compare).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PLUS_OFFSETS = ((0, 1), (2, 1), (1, 0), (1, 2))
_SQUARE_OFFSETS = tuple((dy, dx) for dy in range(3) for dx in range(3)
                        if not (dy == 1 and dx == 1))


def _make_nms_kernel(footprint: str):
    offsets = _PLUS_OFFSETS if footprint == "plus" else _SQUARE_OFFSETS
    strict = footprint == "plus"

    def kernel(thre_ref, heat_ref, out_ref):
        """One (H, W) heatmap tile: suppress non-local-maxima and
        sub-threshold responses."""
        x = heat_ref[0]                                   # (H, W) in VMEM
        h, w = x.shape
        neg = jnp.float32(-jnp.inf)
        padded = jnp.pad(x, 1, mode="constant", constant_values=neg)
        hmax = x
        # neighbour max via static shifted slices (VPU work, no gathers)
        for dy, dx in offsets:
            hmax = jnp.maximum(hmax, padded[dy:dy + h, dx:dx + w])
        thre = thre_ref[0, 0]
        keep = (x >= hmax) & ((x > thre) if strict else (x >= thre))
        out_ref[0] = jnp.where(keep, x, 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "footprint"))
def nms_pallas(heat: jnp.ndarray, thre: float = 0.1,
               footprint: str = "plus", interpret: bool = False) -> jnp.ndarray:
    """heat: (..., H, W) -> NMS'd maps (same shape).

    Grid: one program per leading-dims tile; each holds its (H, W) map in
    VMEM (128x128 fp32 = 64 KB) and does the shifted max compares.
    """
    lead = heat.shape[:-2]
    h, w = heat.shape[-2:]
    flat = heat.reshape((-1, h, w)).astype(jnp.float32)
    n = flat.shape[0]
    thre_arr = jnp.full((1, 1), thre, jnp.float32)

    out = pl.pallas_call(
        _make_nms_kernel(footprint),
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


def nms(heat: jnp.ndarray, thre: float = 0.1,
        footprint: str = "plus") -> jnp.ndarray:
    """Backend-dispatching NMS: Pallas on TPU, XLA elsewhere."""
    from improved_body_parts_tpu.ops.peaks import heatmap_nms
    if jax.default_backend() == "tpu":
        return nms_pallas(heat, thre, footprint=footprint)
    return heatmap_nms(heat, thre, footprint=footprint)

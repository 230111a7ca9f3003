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


# ---------------------------------------------------------------------------
# fused NMS -> top-k -> patch extraction (one VMEM pass per channel)
# ---------------------------------------------------------------------------

def _make_fused_peaks_kernel(footprint: str, max_peaks: int, win: int):
    offsets = _PLUS_OFFSETS if footprint == "plus" else _SQUARE_OFFSETS
    strict = footprint == "plus"
    size = 2 * win + 1

    def kernel(thre_ref, heat_ref, scores_ref, yx_ref, nraw_ref, patch_ref):
        x = heat_ref[0]                                   # (H, W) in VMEM
        h, w = x.shape
        neg = jnp.float32(-jnp.inf)
        padded = jnp.pad(x, 1, mode="constant", constant_values=neg)
        hmax = x
        for dy, dx in offsets:
            hmax = jnp.maximum(hmax, padded[dy:dy + h, dx:dx + w])
        thre = thre_ref[0, 0]
        keep = (x >= hmax) & ((x > thre) if strict else (x >= thre))
        nmsed = jnp.where(keep, x, 0.0)
        nraw_ref[0, 0] = jnp.full((nraw_ref.shape[-1],),
                                  jnp.sum(keep.astype(jnp.int32)), jnp.int32)

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        tap_y = jax.lax.broadcasted_iota(jnp.int32, (size, h), 0)
        span_y = jax.lax.broadcasted_iota(jnp.int32, (size, h), 1)
        tap_x = jax.lax.broadcasted_iota(jnp.int32, (size, w), 0)
        span_x = jax.lax.broadcasted_iota(jnp.int32, (size, w), 1)

        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, max_peaks), 1)
        slot_iota3 = jax.lax.broadcasted_iota(
            jnp.int32, (max_peaks, size, size), 0)

        def body(k, carry):
            nm, scores, ys, xs, patches = carry
            # masked-argmax round: strongest remaining NMS response.
            # flat argmax by (score, lowest-flat-index) — same tie-break as
            # a stable descending sort / lax.top_k
            best = jnp.max(nm)
            is_best = nm == best
            flat_idx = jnp.min(jnp.where(
                is_best, row_iota * w + col_iota, h * w))
            cy = flat_idx // w
            cx = flat_idx % w
            # 5x5 patch about (cy,cx) from the ORIGINAL map as two one-hot
            # contractions (rows outside the map give zero rows — exactly
            # the zero-filled OOB cells of the XLA _gather_patch path)
            ey = (tap_y + cy - win == span_y).astype(jnp.float32)  # (S, H)
            ex = (tap_x + cx - win == span_x).astype(jnp.float32)  # (S, W)
            patch = jax.lax.dot_general(
                jax.lax.dot_general(ey, x, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32),
                ex, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)                # (S, S)
            # slot-k writes as one-hot SELECTS (Mosaic lowers neither
            # scatter (.at[k].set) nor lax.scan carries here)
            hit = slot_iota == k                                   # (1, P)
            scores = jnp.where(hit, best, scores)
            ys = jnp.where(hit, cy, ys)
            xs = jnp.where(hit, cx, xs)
            patches = jnp.where(slot_iota3 == k, patch[None], patches)
            nm = jnp.where((row_iota == cy) & (col_iota == cx), 0.0, nm)
            return nm, scores, ys, xs, patches

        init = (nmsed,
                jnp.zeros((1, max_peaks), jnp.float32),
                jnp.zeros((1, max_peaks), jnp.int32),
                jnp.zeros((1, max_peaks), jnp.int32),
                jnp.zeros((max_peaks, size, size), jnp.float32))
        _, scores, ys, xs, patches = jax.lax.fori_loop(
            0, max_peaks, body, init)
        scores_ref[0, 0] = scores[0]
        yx_ref[0] = jnp.stack([ys[0], xs[0]], axis=-1)
        patch_ref[0] = patches

    return kernel


@functools.partial(jax.jit, static_argnames=("max_peaks", "footprint", "win",
                                             "interpret"))
def fused_peaks_pallas(heat: jnp.ndarray, thre: float = 0.1,
                       max_peaks: int = 32, footprint: str = "plus",
                       win: int = 2, interpret: bool = False):
    """One fused VMEM pass per channel: NMS + iterative top-k + 5x5 patch
    extraction about each peak.

    heat: (K, H, W). Returns (scores (K, P), yx (K, P, 2) int32 [y, x],
    n_raw (K,) int32, patches (K, P, 2*win+1, 2*win+1)) where invalid slots
    have score 0. Replaces the XLA nms -> reshape -> lax.top_k -> vmapped
    dynamic patch gathers of ops/peaks.find_peaks — the gathers are
    scalar-unit work and dominated the round-1 postproc profile; here each
    patch is two one-hot contractions while the map is VMEM-resident.
    """
    k, h, w = heat.shape
    size = 2 * win + 1
    thre_arr = jnp.full((1, 1), thre, jnp.float32)
    out = pl.pallas_call(
        _make_fused_peaks_kernel(footprint, max_peaks, win),
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # Mosaic block-shape rule: the last two dims of every block must be
        # divisible by (8, 128) or EQUAL the overall array dims — so every
        # per-channel output keeps a leading (1,) block dim and full trailing
        # dims ((k, 1, P) instead of (k, P), etc.)
        out_specs=[
            pl.BlockSpec((1, 1, max_peaks), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max_peaks, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, max_peaks), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max_peaks, size, size), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, 1, max_peaks), jnp.float32),
            jax.ShapeDtypeStruct((k, max_peaks, 2), jnp.int32),
            jax.ShapeDtypeStruct((k, 1, max_peaks), jnp.int32),
            jax.ShapeDtypeStruct((k, max_peaks, size, size), jnp.float32),
        ],
        interpret=interpret,
    )(thre_arr, heat.astype(jnp.float32))
    scores, yx, n_raw, patches = out
    return scores[:, 0], yx, n_raw[:, 0, 0], patches

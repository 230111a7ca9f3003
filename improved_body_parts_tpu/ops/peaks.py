"""On-device keypoint peak finding: max-pool NMS + top-k + sub-pixel refinement.

TPU-native replacement for the reference's peak stack:
  * GPU 3x3 max-pool NMS with reflect padding + threshold
    (utils/util.py:177-185 ``keypoint_heatmap_nms``)
  * per-peak sub-pixel refinement — we implement BOTH reference schemes:
      - 5x5-patch bicubic-upsample argmax at the stride scale
        (utils/parse_skeletons.py:126-176 ``heatmap_nms``, the 66.1-AP path)
      - weighted-centroid refinement (utils/util.py:188-213 ``refine_centroid``)
  * fixed-size peak tables: every joint type gets exactly ``max_peaks`` slots
    (validity-masked) so the whole pipeline stays static-shaped for XLA.

Peaks are found on the stride-4 heatmap and refined into padded-image pixel
coordinates (the reference "refactor" path, evaluate.py:74-80) — no full-map
upsample to image resolution is ever materialised.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class PeakTable(NamedTuple):
    """Fixed-size per-joint-type peak table (K joint types, P slots)."""
    xy: jnp.ndarray      # (K, P, 2) float32 — refined (x, y) in image pixels
    score: jnp.ndarray   # (K, P) float32
    valid: jnp.ndarray   # (K, P) bool
    grid_yx: jnp.ndarray  # (K, P, 2) int32 — integer peak cell on stride map


def heatmap_nms(heat: jnp.ndarray, thre: float = 0.1) -> jnp.ndarray:
    """3x3 max-pool NMS with reflect padding; zero non-peaks and sub-threshold.

    heat: (..., H, W) — any leading batch/channel dims.
    reference: utils/util.py:177-185.
    """
    pad_widths = [(0, 0)] * (heat.ndim - 2) + [(1, 1), (1, 1)]
    padded = jnp.pad(heat, pad_widths, mode="reflect")
    window = (1,) * (heat.ndim - 2) + (3, 3)
    hmax = lax.reduce_window(padded, -jnp.inf, lax.max, window,
                             (1,) * heat.ndim, "valid")
    keep = (hmax == heat) & (heat >= thre)
    return jnp.where(keep, heat, 0.0)


def resized_coords(coords: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Half-pixel coordinate mapping between resolutions.

    reference: parse_skeletons.py:122-123 ``compute_resized_coords``.
    """
    return (coords.astype(jnp.float32) + 0.5) * factor - 0.5


def _gather_patch(map2d: jnp.ndarray, cy: jnp.ndarray, cx: jnp.ndarray,
                  radius: int):
    """Gather a (2r+1)^2 patch around (cy,cx) with clamped indices.

    Returns (patch, inbounds_mask) of shape (2r+1, 2r+1)."""
    h, w = map2d.shape
    size = 2 * radius + 1
    dy = jnp.arange(-radius, radius + 1)
    dx = jnp.arange(-radius, radius + 1)
    yy = cy + dy[:, None]
    xx = cx + dx[None, :]
    yy = jnp.broadcast_to(yy, (size, size))
    xx = jnp.broadcast_to(xx, (size, size))
    inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
    patch = map2d[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
    return patch, inb


def _cubic_upsample_basis(size: int, up: int) -> jnp.ndarray:
    """(size^2, (size*up)^2) matrix equal to jax.image.resize(..., 'cubic')
    on a size x size patch. Cubic resize is linear in the input, so the
    operator is materialized exactly by resizing the canonical basis —
    turning the per-peak patch upsample into ONE batched MXU matmul."""
    eye = jnp.eye(size * size, dtype=jnp.float32).reshape(size * size, size, size)
    basis = jax.vmap(lambda p: jax.image.resize(
        p, (size * up, size * up), method="cubic"))(eye)
    return basis.reshape(size * size, (size * up) ** 2)


def _refine_bicubic(map2d: jnp.ndarray, cy: jnp.ndarray, cx: jnp.ndarray,
                    stride: int):
    """Bicubic 5x5-patch argmax refinement into image coordinates.

    reference: parse_skeletons.py:141-173 (win_size=2, upsample by stride).
    The patch upsample runs through the precomputed linear basis (exactly
    jax.image.resize cubic). Returns (x_img, y_img, score)."""
    win = 2
    up = stride
    patch, inb = _gather_patch(map2d, cy, cx, win)
    # reference crops the patch at the border; we instead mask out-of-bounds
    # cells with the patch min so argmax never selects them
    patch = jnp.where(inb, patch, patch.min())
    size = 2 * win + 1
    upsz = size * up
    basis = _cubic_upsample_basis(size, up)          # folded to a constant
    patch_up = jnp.dot(patch.reshape(-1), basis,
                       preferred_element_type=jnp.float32)
    flat_idx = jnp.argmax(patch_up)
    uy, ux = flat_idx // upsz, flat_idx % upsz
    score = patch_up[flat_idx]
    # reference computes patch offsets wrt the clipped window origin
    y0 = jnp.maximum(cy - win, 0)
    x0 = jnp.maximum(cx - win, 0)
    center_up = resized_coords(jnp.stack([cy - y0, cx - x0]), up)
    dyx = jnp.stack([uy, ux]).astype(jnp.float32) - center_up
    base = resized_coords(jnp.stack([cy, cx]).astype(jnp.float32), up)
    y_img = base[0] + dyx[0]
    x_img = base[1] + dyx[1]
    return x_img, y_img, score


def _refine_centroid(map2d: jnp.ndarray, cy: jnp.ndarray, cx: jnp.ndarray,
                     stride: int, radius: int = 2):
    """Weighted-centroid refinement (on the stride map), scaled to image coords.

    reference: utils/util.py:188-213 (score-box mean as refined score). Falls
    back to the raw cell when the window crosses the border, as the reference
    does."""
    patch, inb = _gather_patch(map2d, cy, cx, radius)
    fully_inb = jnp.all(inb)
    w = jnp.where(inb, patch, 0.0)
    grid = jnp.arange(-radius, radius + 1).astype(jnp.float32)
    total = jnp.sum(w)
    off_x = jnp.sum(w * grid[None, :]) / jnp.maximum(total, 1e-12)
    off_y = jnp.sum(w * grid[:, None]) / jnp.maximum(total, 1e-12)
    score_box_mean = jnp.sum(w) / (2 * radius + 1) ** 2
    raw = map2d[cy, cx]
    fx = jnp.where(fully_inb, cx.astype(jnp.float32) + off_x, cx.astype(jnp.float32))
    fy = jnp.where(fully_inb, cy.astype(jnp.float32) + off_y, cy.astype(jnp.float32))
    score = jnp.where(fully_inb, score_box_mean, raw)
    return resized_coords(fx, stride), resized_coords(fy, stride), score


@functools.partial(jax.jit, static_argnames=("max_peaks", "stride", "refine", "thre"))
def find_peaks(heat: jnp.ndarray, *, thre: float = 0.1, max_peaks: int = 32,
               stride: int = 4, refine: str = "bicubic") -> PeakTable:
    """Find up to ``max_peaks`` peaks per joint-type channel.

    heat: (H, W, K) stride-resolution keypoint heatmaps (K=18).
    Returns a PeakTable with refined coordinates in padded-image pixels.
    """
    h, w, k = heat.shape
    chan_first = jnp.moveaxis(heat, -1, 0)                 # (K, H, W)
    from improved_body_parts_tpu.ops.pallas_kernels import nms
    nmsed = nms(chan_first, thre)      # Pallas kernel on TPU, XLA elsewhere

    flat = nmsed.reshape(k, h * w)
    top_scores, top_idx = lax.top_k(flat, max_peaks)       # (K, P)
    valid = top_scores > 0.0
    cy = top_idx // w
    cx = top_idx % w

    refine_fn = _refine_bicubic if refine == "bicubic" else _refine_centroid

    def per_channel(map2d, cys, cxs):
        return jax.vmap(lambda y, x: refine_fn(map2d, y, x, stride))(cys, cxs)

    xs, ys, scores = jax.vmap(per_channel)(chan_first, cy, cx)
    xy = jnp.stack([xs, ys], axis=-1)
    scores = jnp.where(valid, scores, 0.0)
    return PeakTable(xy=xy.astype(jnp.float32), score=scores.astype(jnp.float32),
                     valid=valid, grid_yx=jnp.stack([cy, cx], axis=-1))

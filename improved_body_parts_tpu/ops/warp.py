"""On-device 2-D affine warping (bilinear), used by rotation TTA.

The reference rotates the input with cv2.warpAffine and un-rotates the
output heatmaps on host (utils/parse_skeletons.py:215-218, 265-267); here
both warps are XLA gathers that stay on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rotation_matrix(center_xy, angle_deg: float, scale: float = 1.0) -> np.ndarray:
    """2x3 matrix mapping OUTPUT pixel coords to INPUT coords for a rotation
    by ``angle_deg`` around ``center_xy`` (cv2.getRotationMatrix2D convention,
    but returned as the inverse map needed for gather-based warping)."""
    a = np.deg2rad(angle_deg)
    cos_a, sin_a = np.cos(a) / scale, np.sin(a) / scale
    cx, cy = center_xy
    # inverse of [R | t]: x_in = R^-1 (x_out - c) + c
    m = np.array([
        [cos_a, sin_a, cx - cos_a * cx - sin_a * cy],
        [-sin_a, cos_a, cy + sin_a * cx - cos_a * cy],
    ], np.float32)
    return m


def resize_cubic_cv2(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.resize(..., interpolation=INTER_CUBIC)-exact resize of (H, W, C)
    as two separable basis matmuls (Keys a=-0.75, half-pixel mapping,
    replicate border). The TTA image/heatmap resizes in the reference use
    cv2 INTER_CUBIC (parse_skeletons.py:204, 250-263); jax.image.resize
    differs (Keys a=-0.5 + antialiasing on downscale), so the exact path
    builds the cv2 operator as trace-time constants — two dense matmuls the
    MXU eats (512x768 class shapes)."""
    from improved_body_parts_tpu.ops.peaks import resize1d_cubic_matrix
    h, w = img.shape[:2]
    my = jnp.asarray(resize1d_cubic_matrix(h, out_h, -0.75), img.dtype)
    mx = jnp.asarray(resize1d_cubic_matrix(w, out_w, -0.75), img.dtype)
    # (H,W,C) -> (out_h,W,C): contract H with my
    out = jnp.einsum("hk,hwc->kwc", my, img)
    out = jnp.einsum("wk,hwc->hkc", mx, out)
    return out


def affine_warp(img: jnp.ndarray, inv_m: np.ndarray,
                fill_value=0.0, out_hw=None) -> jnp.ndarray:
    """Warp (H, W, C) by the inverse map ``inv_m`` (output->input coords),
    bilinear, constant fill outside. ``fill_value`` may be a scalar or a
    (C,)-vector (per-channel border, cv2 borderValue-style); ``out_hw``
    sets the output canvas (defaults to the input shape)."""
    h, w = img.shape[:2]
    oh, ow = out_hw or (h, w)
    yy, xx = jnp.mgrid[0:oh, 0:ow]
    xs = inv_m[0, 0] * xx + inv_m[0, 1] * yy + inv_m[0, 2]
    ys = inv_m[1, 0] * xx + inv_m[1, 1] * yy + inv_m[1, 2]
    inb = (xs >= 0) & (xs <= w - 1) & (ys >= 0) & (ys <= h - 1)
    xc = jnp.clip(xs, 0, w - 1)
    yc = jnp.clip(ys, 0, h - 1)
    x0 = jnp.floor(xc).astype(jnp.int32)
    y0 = jnp.floor(yc).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (xc - x0)[..., None]
    fy = (yc - y0)[..., None]
    v = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
         + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)
    return jnp.where(inb[..., None], v, jnp.asarray(fill_value, v.dtype))

"""On-device keypoint peak finding: max-pool NMS + top-k + sub-pixel refinement.

TPU-native replacement for the reference's peak stack:
  * NMS — both reference schemes:
      - "plus" footprint (scipy ``maximum_filter`` with
        ``generate_binary_structure(2, 1)``, strict ``> thre``) — the
        refactored 66.1-AP path (utils/parse_skeletons.py:106-119)
      - "square" 3x3 max-pool with reflect padding and ``>= thre`` — the
        original GPU path (utils/util.py:177-185)
  * per-peak sub-pixel refinement — both reference schemes:
      - cropped-patch bicubic-upsample argmax at the stride scale
        (utils/parse_skeletons.py:126-176 ``heatmap_nms``, the 66.1-AP
        path). The patch crop at map borders and cv2's INTER_CUBIC
        (Keys a=-0.75, half-pixel mapping, replicate border) are
        reproduced exactly — as a per-border-case linear basis so the
        upsample stays two small MXU matmuls per peak.
      - weighted-centroid refinement (utils/util.py:188-213
        ``refine_centroid``)
  * fixed-size peak tables: every joint type gets exactly ``max_peaks``
    slots (validity-masked) so the whole pipeline stays static-shaped.

Peaks are found on the stride-4 heatmap and refined into padded-image pixel
coordinates (the reference "refactor" path, evaluate.py:74-80) — no full-map
upsample to image resolution is ever materialised.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# cv2 INTER_CUBIC uses the Keys kernel with a=-0.75; jax.image.resize and
# most other frameworks use a=-0.5. The reference's AP numbers were produced
# with cv2, so -0.75 is our default everywhere.
CV2_CUBIC_A = -0.75


class PeakTable(NamedTuple):
    """Fixed-size per-joint-type peak table (K joint types, P slots)."""
    xy: jnp.ndarray      # (K, P, 2) float32 — refined (x, y) in image pixels
    score: jnp.ndarray   # (K, P) float32
    valid: jnp.ndarray   # (K, P) bool
    grid_yx: jnp.ndarray  # (K, P, 2) int32 — integer peak cell on stride map
    n_raw: jnp.ndarray = None  # (K,) int32 — NMS peaks BEFORE the top-k cut;
    #                            n_raw > P means peaks were dropped
    #                            (saturation telemetry; pafprocess.h caps the
    #                            same tables at NMS_MAX_PEAKS=64 silently)


def heatmap_nms(heat: jnp.ndarray, thre: float = 0.1,
                footprint: str = "plus") -> jnp.ndarray:
    """Suppress non-local-maxima and sub-threshold responses.

    heat: (..., H, W) — any leading batch/channel dims.

    footprint="plus": 4-neighbourhood local-max test with STRICT ``> thre``
    — exactly scipy ``maximum_filter(img, generate_binary_structure(2,1))
    == img) * (img > thre)`` (parse_skeletons.py:106-119; scipy's 'reflect'
    border pads with the edge pixel, which for a radius-1 plus window is
    the centre itself, i.e. equivalent to -inf padding).

    footprint="square": 3x3 window with reflect padding and ``>= thre``
    (utils/util.py:177-185).
    """
    h, w = heat.shape[-2:]
    if footprint == "plus":
        pad_widths = [(0, 0)] * (heat.ndim - 2) + [(1, 1), (1, 1)]
        padded = jnp.pad(heat, pad_widths, mode="constant",
                         constant_values=-jnp.inf)
        up = padded[..., 0:h, 1:w + 1]
        down = padded[..., 2:h + 2, 1:w + 1]
        left = padded[..., 1:h + 1, 0:w]
        right = padded[..., 1:h + 1, 2:w + 2]
        hmax = jnp.maximum(jnp.maximum(up, down), jnp.maximum(left, right))
        keep = (heat >= hmax) & (heat > thre)
        return jnp.where(keep, heat, 0.0)
    assert footprint == "square", footprint
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


# ---------------------------------------------------------------------------
# cv2-exact cubic upsampling as a linear basis
# ---------------------------------------------------------------------------

def keys_cubic_weights(f: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic-convolution weights for the 4 taps (x0-1, x0, x0+1, x0+2)
    at fractional position f in [0, 1). Shape (..., 4)."""
    f = np.asarray(f, np.float64)
    # distances of the 4 taps from the sample point: 1+f, f, 1-f, 2-f
    t = np.stack([1.0 + f, f, 1.0 - f, 2.0 - f], axis=-1)
    at = np.abs(t)
    near = (a + 2) * at ** 3 - (a + 3) * at ** 2 + 1          # |t| <= 1
    far = a * (at ** 3 - 5 * at ** 2 + 8 * at - 4)            # 1 < |t| < 2
    return np.where(at <= 1.0, near, far)


def resize1d_cubic_matrix(s_in: int, s_out: int, a: float) -> np.ndarray:
    """(s_in, s_out) matrix M with (signal @ M) == cv2.resize INTER_CUBIC of
    the 1-D signal: half-pixel coordinate mapping, replicate border (clamped
    taps), Keys kernel with parameter ``a``. cv2.resize is separable, so the
    2-D resize of a patch is basisY.T @ patch @ basisX."""
    m = np.zeros((s_in, s_out), np.float64)
    scale = s_in / s_out
    for X in range(s_out):
        x = (X + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        w = keys_cubic_weights(x - x0, a)
        for k in range(4):
            m[min(max(x0 - 1 + k, 0), s_in - 1), X] += w[k]
    return m


@functools.lru_cache(maxsize=None)
def _border_case_bases(win: int, up: int, a: float):
    """Per-border-case 1-D upsample bases for the cropped-patch refinement.

    The reference CROPS the (2*win+1)-cell patch at map borders and resizes
    the crop (parse_skeletons.py:143-153). Cases per axis (at most one side
    can clip when the map is at least 2*win+1 cells wide):
      0: interior; 1..win: low side clipped by c; win+1..2*win: high side
      clipped by c-win.
    Returns (bases (2*win+1 cases, size, size*up) float32,
             valid (cases, size*up) bool) — basis rows of clipped cells are
    zero and outputs beyond the cropped extent are invalid.
    """
    size = 2 * win + 1
    n_cases = 2 * win + 1
    bases = np.zeros((n_cases, size, size * up), np.float64)
    valid = np.zeros((n_cases, size * up), bool)
    for case in range(n_cases):
        lo_clip = case if case <= win else 0
        hi_clip = case - win if case > win else 0
        s = size - lo_clip - hi_clip
        m = resize1d_cubic_matrix(s, s * up, a)
        bases[case, lo_clip:lo_clip + s, :s * up] = m
        valid[case, :s * up] = True
    # cached as NUMPY (device constants created under jit would cache tracers)
    return bases.astype(np.float32), valid


def _border_case_index(c: jnp.ndarray, size: int, win: int) -> jnp.ndarray:
    """Case index for coordinate c on an axis of ``size`` cells."""
    lo = jnp.maximum(win - c, 0)                       # cells clipped low
    hi = jnp.maximum(c + win - (size - 1), 0)          # cells clipped high
    return jnp.where(lo > 0, lo, jnp.where(hi > 0, hi + win, 0))


def _refine_bicubic(map2d: jnp.ndarray, cy: jnp.ndarray, cx: jnp.ndarray,
                    stride: int, cubic_a: float = CV2_CUBIC_A,
                    up: int | None = None):
    """Cropped-patch bicubic-upsample argmax refinement into image coords.

    Exact reproduction of the reference refinement
    (parse_skeletons.py:141-173): crop a 5x5 patch (smaller at map borders),
    cv2-INTER_CUBIC-upsample it by ``stride``, take the argmax. The
    upsample runs as two per-case basis matmuls (cv2 bicubic is separable
    and linear); invalid (beyond-crop) outputs are masked to -inf so the
    argmax — including its row-major tie-break — matches numpy's over the
    cropped map. Returns (x_img, y_img, score)."""
    win = 2
    h, w = map2d.shape
    patch, inb = _gather_patch(map2d, cy, cx, win)
    patch = jnp.where(inb, patch, 0.0)   # clipped cells have zero basis rows
    return _refine_bicubic_from_patch(patch, cy, cx, h, w, stride, cubic_a,
                                      up=up)


def _refine_bicubic_from_patch(patch: jnp.ndarray, cy: jnp.ndarray,
                               cx: jnp.ndarray, h: int, w: int,
                               stride: int, cubic_a: float = CV2_CUBIC_A,
                               win: int = 2, up: int | None = None):
    """Same refinement given a pre-gathered (2*win+1)^2 patch whose
    out-of-map cells are zero (the fused Pallas kernel's output).

    ``up`` is the patch upsample factor. up == stride (default) reproduces
    the reference exactly: the argmax lands on the image-resolution integer
    grid, i.e. coordinates quantize to 1 px. A larger ``up`` (e.g.
    2*stride) samples the same cv2-cubic surface on a finer grid, giving
    sub-pixel peaks at the cost of a bigger (still tiny) basis matmul —
    an accuracy knob the reference's host loop doesn't have."""
    if up is None:
        up = stride
    size = 2 * win + 1
    bases_np, valids_np = _border_case_bases(win, up, cubic_a)
    bases = jnp.asarray(bases_np)
    valids = jnp.asarray(valids_np)
    iy = _border_case_index(cy, h, win)
    ix = _border_case_index(cx, w, win)
    by = bases[iy]                        # (size, size*up)
    bx = bases[ix]
    vy = valids[iy]                       # (size*up,)
    vx = valids[ix]
    patch_up = jnp.dot(jnp.dot(by.T, patch, preferred_element_type=jnp.float32),
                       bx, preferred_element_type=jnp.float32)
    patch_up = jnp.where(vy[:, None] & vx[None, :], patch_up, -jnp.inf)
    upsz = size * up
    flat_idx = jnp.argmax(patch_up)
    uy, ux = flat_idx // upsz, flat_idx % upsz
    score = patch_up.reshape(-1)[flat_idx]
    # patch offsets are relative to the clipped window origin, in up-grid
    # units; scale them into image pixels by stride/up (== 1 for the
    # reference-exact up == stride)
    y0 = jnp.maximum(cy - win, 0)
    x0 = jnp.maximum(cx - win, 0)
    center_up = resized_coords(jnp.stack([cy - y0, cx - x0]), up)
    dyx = (jnp.stack([uy, ux]).astype(jnp.float32) - center_up) * \
        (float(stride) / up)
    base = resized_coords(jnp.stack([cy, cx]).astype(jnp.float32), stride)
    y_img = base[0] + dyx[0]
    x_img = base[1] + dyx[1]
    return x_img, y_img, score


def _refine_centroid(map2d: jnp.ndarray, cy: jnp.ndarray, cx: jnp.ndarray,
                     stride: int, radius: int = 2, cubic_a: float = 0.0):
    """Weighted-centroid refinement (on the stride map), scaled to image coords.

    reference: utils/util.py:188-213 (score-box mean as refined score). Falls
    back to the raw cell when the window crosses the border, as the reference
    does. NOTE the reference's ``np.mgrid[-r:r+1, -r:r+1]`` swaps the two
    offset grids, so its x-offset actually comes from the y-direction moment
    and vice versa; we reproduce that behaviour for parity."""
    patch, inb = _gather_patch(map2d, cy, cx, radius)
    fully_inb = jnp.all(inb)
    w = jnp.where(inb, patch, 0.0)
    grid = jnp.arange(-radius, radius + 1).astype(jnp.float32)
    total = jnp.sum(w)
    # reference swap: offset_x uses the row-varying grid (y moment)
    off_x = jnp.sum(w * grid[:, None]) / jnp.maximum(total, 1e-12)
    off_y = jnp.sum(w * grid[None, :]) / jnp.maximum(total, 1e-12)
    score_box_mean = jnp.sum(w) / (2 * radius + 1) ** 2
    raw = map2d[cy, cx]
    fx = jnp.where(fully_inb, cx.astype(jnp.float32) + off_x, cx.astype(jnp.float32))
    fy = jnp.where(fully_inb, cy.astype(jnp.float32) + off_y, cy.astype(jnp.float32))
    score = jnp.where(fully_inb, score_box_mean, raw)
    return resized_coords(fx, stride), resized_coords(fy, stride), score


@functools.partial(jax.jit, static_argnames=("max_peaks", "stride", "refine",
                                             "thre", "footprint", "cubic_a",
                                             "fused", "refine_upsample"))
def find_peaks(heat: jnp.ndarray, *, thre: float = 0.1, max_peaks: int = 32,
               stride: int = 4, refine: str = "bicubic",
               footprint: str | None = None,
               cubic_a: float = CV2_CUBIC_A,
               fused: bool | None = None,
               content_hw: jnp.ndarray | None = None,
               refine_upsample: int | None = None) -> PeakTable:
    """Find up to ``max_peaks`` peaks per joint-type channel.

    heat: (H, W, K) stride-resolution keypoint heatmaps (K=18).
    refine="bicubic" (the reference's refactored 66.1-AP path) pairs with
    the "plus" NMS footprint; refine="centroid" (original path) with the
    "square" one — pass ``footprint`` to override. ``cubic_a`` selects the
    cubic kernel (-0.75 = cv2/reference-exact; -0.5 = Keys/jax flavour).

    ``fused`` selects the single-pass Pallas kernel (NMS + top-k + patch
    extraction fused in VMEM, pallas_kernels.fused_peaks_pallas; bicubic
    refinement only). None = automatic: on for the TPU backend.

    ``refine_upsample`` (bicubic only) samples the refinement patch's cubic
    surface on a finer grid than the reference's ``stride`` factor —
    refine_upsample=8 with stride 4 gives half-pixel peak coordinates
    instead of the reference's 1 px argmax quantization
    (parse_skeletons.py:149-153 upsamples by exactly the stride).

    ``content_hw`` ((2,) float [h, w], traced) bounds the valid image
    content in padded-image pixels: NMS cells whose pixel footprint starts
    at/after the extent are zeroed BEFORE the top-k cut (so pad-region
    responses never crowd out real peaks), and refined coordinates past the
    extent are invalidated. This reproduces the reference ORIGINAL path's
    unpad-before-peaks semantics (parse_skeletons.py:272-281) on the stride
    map; the reference refactor path finds peaks on the full padded map
    (evaluate.py:74-80) — pass None for that behaviour.
    Returns a PeakTable with refined coordinates in padded-image pixels.
    """
    h, w, k = heat.shape
    if footprint is None:
        footprint = "plus" if refine == "bicubic" else "square"
    chan_first = jnp.moveaxis(heat, -1, 0)                 # (K, H, W)
    if fused is None:
        # stays opt-in until the Mosaic lowering is validated on real
        # hardware each round (tools/profile_postproc.py --fused)
        fused = False

    cell_ok = None
    if content_hw is not None:
        # a stride cell (cy, cx) covers pixels [c*stride, c*stride+stride-1];
        # it contains content iff c*stride < extent
        col_ok = jnp.arange(w, dtype=jnp.float32) * stride < content_hw[1]
        row_ok = jnp.arange(h, dtype=jnp.float32) * stride < content_hw[0]
        cell_ok = row_ok[:, None] & col_ok[None, :]        # (H, W)

    def _mask_refined(xy, scores, valid):
        if content_hw is None:
            return scores, valid
        inb = (xy[..., 0] < content_hw[1]) & (xy[..., 1] < content_hw[0])
        return jnp.where(inb, scores, 0.0), valid & inb

    if fused and refine == "bicubic":
        if cell_ok is not None:
            # the fused kernel runs NMS internally, so the content mask is
            # applied to the input map (zeros beyond the extent cannot pass
            # the > thre test; boundary-cell NMS decisions then see 0 where
            # the unfused path sees the raw pad response — peaks AT the
            # content edge can differ from the unfused path in that rare
            # case, matching the cropped-map semantics instead)
            chan_first = jnp.where(cell_ok[None], chan_first, 0.0)
        from improved_body_parts_tpu.ops.pallas_kernels import (
            fused_peaks_pallas)
        interpret = jax.default_backend() != "tpu"
        top_scores, yx, n_raw, patches = fused_peaks_pallas(
            chan_first, thre, max_peaks=max_peaks, footprint=footprint,
            interpret=interpret)
        valid = top_scores > 0.0
        cy, cx = yx[..., 0], yx[..., 1]

        def per_channel(patches_c, cys, cxs):
            return jax.vmap(
                lambda p, y, x: _refine_bicubic_from_patch(
                    p, y, x, h, w, stride, cubic_a=cubic_a,
                    up=refine_upsample))(
                patches_c, cys, cxs)

        xs, ys, scores = jax.vmap(per_channel)(patches, cy, cx)
        xy = jnp.stack([xs, ys], axis=-1)
        scores = jnp.where(valid, scores, 0.0)
        scores, valid = _mask_refined(xy, scores, valid)
        return PeakTable(xy=xy.astype(jnp.float32),
                         score=scores.astype(jnp.float32),
                         valid=valid, grid_yx=jnp.stack([cy, cx], axis=-1),
                         n_raw=n_raw)

    from improved_body_parts_tpu.ops.pallas_kernels import nms
    nmsed = nms(chan_first, thre, footprint=footprint)
    if cell_ok is not None:
        nmsed = jnp.where(cell_ok[None], nmsed, 0.0)

    flat = nmsed.reshape(k, h * w)
    n_raw = jnp.sum(flat > 0.0, axis=1).astype(jnp.int32)  # (K,) pre-top-k
    top_scores, top_idx = lax.top_k(flat, max_peaks)       # (K, P)
    valid = top_scores > 0.0
    cy = top_idx // w
    cx = top_idx % w

    if refine == "bicubic":
        def refine_fn(map2d, y, x):
            return _refine_bicubic(map2d, y, x, stride, cubic_a=cubic_a,
                                   up=refine_upsample)
    elif refine == "centroid":
        def refine_fn(map2d, y, x):
            return _refine_centroid(map2d, y, x, stride, cubic_a=cubic_a)
    elif refine == "none":
        # no sub-pixel refinement: the raw NMS cell mapped to image pixels
        # (cell top-left, the coordinate the reference would use before its
        # upsample-argmax step, parse_skeletons.py:149-153)
        def refine_fn(map2d, y, x):
            return (x.astype(jnp.float32) * stride,
                    y.astype(jnp.float32) * stride, map2d[y, x])
    else:
        raise ValueError(f"unknown refine scheme: {refine!r}")

    def per_channel(map2d, cys, cxs):
        return jax.vmap(lambda y, x: refine_fn(map2d, y, x))(cys, cxs)

    xs, ys, scores = jax.vmap(per_channel)(chan_first, cy, cx)
    xy = jnp.stack([xs, ys], axis=-1)
    scores = jnp.where(valid, scores, 0.0)
    scores, valid = _mask_refined(xy, scores, valid)
    return PeakTable(xy=xy.astype(jnp.float32), score=scores.astype(jnp.float32),
                     valid=valid, grid_yx=jnp.stack([cy, cx], axis=-1),
                     n_raw=n_raw)

"""End-to-end TPU inference pipeline: image -> skeletons.

Re-designed from the reference inference stack (utils/parse_skeletons.py:28-321,
demo_image.py:80-243) as a single jitted device program per input shape:

  * [orig, h-flip] run as ONE batch of 2 per image (parse_skeletons.py:221-225);
  * flip-ensemble averaging with the channel permutations on device
    (parse_skeletons.py:242-248);
  * peak finding + limb scoring + greedy connection selection on device
    (ops/peaks.py, ops/limbs.py) at stride-4 resolution — the reference's
    x4 cubic full-map upsample (parse_skeletons.py:250-263) is replaced by
    sampling the stride map directly at the equivalent half-pixel coords;
  * ONE packed result tensor crosses to the host per frame (the TPU sits
    behind a high-latency link: every transfer costs ~tens of ms, so the
    design minimizes round trips — uint8 images up, one ~28 KB packed
    buffer down; the full heat/paf maps never leave the device);
  * the greedy person assembly runs on host (ops/group.py, or the C++
    fast path ops/group_cpp.py).

Static shapes: images are padded bottom/right with pad_value to shape buckets
(multiples of ``bucket``), one XLA program per bucket — the TPU substitute
for the reference's pad-to-64 dynamic shapes (utils/util.py:44-65).
``predict_batch`` additionally processes B letterboxed images per dispatch
for serving-style throughput.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from improved_body_parts_tpu.configs import (
    CanonicalConfig, FLIP_CHANNEL_ORD, NUM_LAYERS, NUM_LIMBS, NUM_PARTS,
    PAF_LAYERS,
)
from improved_body_parts_tpu.ops import group
from improved_body_parts_tpu.ops.limbs import (
    ConnectionCandidates, Connections, connections_to_list, score_connections,
    select_connections,
)
from improved_body_parts_tpu.ops.peaks import PeakTable, find_peaks


# ---------------------------------------------------------------------------
# result packing: everything the host needs, in one float32 tensor
# ---------------------------------------------------------------------------

def packed_size(P: int) -> int:
    return NUM_PARTS * P * 4 + NUM_LIMBS * P * 5 + NUM_PARTS


def pack_results(peaks: PeakTable, conns: Connections) -> jnp.ndarray:
    """Flatten peak + connection tables into one (packed_size,) float32."""
    parts = [
        peaks.xy.reshape(-1),                      # 18*P*2
        peaks.score.reshape(-1),                   # 18*P
        peaks.valid.astype(jnp.float32).reshape(-1),
        conns.src_slot.astype(jnp.float32).reshape(-1),  # 30*P each
        conns.dst_slot.astype(jnp.float32).reshape(-1),
        conns.score.reshape(-1),
        conns.limb_len.reshape(-1),
        conns.valid.astype(jnp.float32).reshape(-1),
        peaks.n_raw.astype(jnp.float32),           # 18 — saturation telemetry
    ]
    return jnp.concatenate(parts)


def unpack_results(buf: np.ndarray, P: int):
    """Inverse of pack_results, on host numpy. Returns (peaks_np, conns_np)
    as plain-numpy PeakTable/Connections."""
    o = 0

    def take(n, shape):
        nonlocal o
        out = buf[o:o + n].reshape(shape)
        o += n
        return out

    xy = take(NUM_PARTS * P * 2, (NUM_PARTS, P, 2))
    score = take(NUM_PARTS * P, (NUM_PARTS, P))
    valid = take(NUM_PARTS * P, (NUM_PARTS, P)) > 0.5
    src = take(NUM_LIMBS * P, (NUM_LIMBS, P)).astype(np.int32)
    dst = take(NUM_LIMBS * P, (NUM_LIMBS, P)).astype(np.int32)
    cscore = take(NUM_LIMBS * P, (NUM_LIMBS, P))
    clen = take(NUM_LIMBS * P, (NUM_LIMBS, P))
    cvalid = take(NUM_LIMBS * P, (NUM_LIMBS, P)) > 0.5
    n_raw = take(NUM_PARTS, (NUM_PARTS,)).astype(np.int32)
    peaks = PeakTable(xy=xy, score=score, valid=valid, grid_yx=None,
                      n_raw=n_raw)
    conns = Connections(src_slot=src, dst_slot=dst, score=cscore,
                        limb_len=clen, valid=cvalid)
    return peaks, conns


# ---------------------------------------------------------------------------
# host-side preprocessing
# ---------------------------------------------------------------------------

def pad_image_to_bucket(img: np.ndarray, bucket: int = 64,
                        pad_value: int = 128,
                        max_hw: Tuple[int, int] = (2600, 3800)) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Pad bottom/right with pad_value up to the next multiple of ``bucket``.

    Returns (padded uint8 image, (orig_h, orig_w)). Normalization to [0,1]
    happens on device (uint8 upload is 4x cheaper over the link).
    reference: utils/util.py:44-65 ``padRightDownCorner`` + size clamp
    parse_skeletons.py:198-201.
    """
    h, w = img.shape[:2]
    if h > max_hw[0] or w > max_hw[1]:
        import cv2
        scale = min(max_hw[0] / h, max_hw[1] / w)
        img = cv2.resize(img, (0, 0), fx=scale, fy=scale,
                         interpolation=cv2.INTER_CUBIC)
        h, w = img.shape[:2]
    ph = -(-h // bucket) * bucket
    pw = -(-w // bucket) * bucket
    out = np.full((ph, pw, 3), pad_value, dtype=np.uint8)
    out[:h, :w] = img
    return out, (h, w)


def center_pad_to_bucket(img: np.ndarray, bucket: int = 64,
                         pad_value: int = 128):
    """Centered variant of the bucket padding (reference utils/util.py:68-100
    ``center_pad``): splits the pad between both sides.

    Returns (padded uint8, pad[up, left, down, right], (orig_h, orig_w))."""
    h, w = img.shape[:2]
    ph = -(-h // bucket) * bucket
    pw = -(-w // bucket) * bucket
    top = (ph - h) // 2
    left = (pw - w) // 2
    out = np.full((ph, pw, 3), pad_value, dtype=np.uint8)
    out[top:top + h, left:left + w] = img
    return out, [top, left, ph - h - top, pw - w - left], (h, w)


def gaussian_blur(maps: jnp.ndarray, kernel_size: int = 5,
                  sigma: float = 1.0) -> jnp.ndarray:
    """Depthwise separable gaussian smoothing with reflect padding
    (reference utils/util.py:103-174 ``GaussianSmoothing`` — optional
    heatmap smoothing before NMS; not in the live path).

    maps: (..., H, W). Returns the smoothed maps."""
    half = (kernel_size - 1) // 2
    xs = jnp.arange(kernel_size, dtype=jnp.float32) - half
    k = jnp.exp(-0.5 * jnp.square(xs / sigma))
    k = k / jnp.sum(k)

    lead = maps.shape[:-2]
    h, w = maps.shape[-2:]
    flat = maps.reshape((-1, h, w))
    pad = [(0, 0), (half, half), (half, half)]
    padded = jnp.pad(flat, pad, mode="reflect")
    # separable: convolve rows then columns via dot products of shifts
    rows = sum(padded[:, :, i:i + w] * k[i] for i in range(kernel_size))
    cols = sum(rows[:, i:i + h, :] * k[i] for i in range(kernel_size))
    return cols.reshape(lead + (h, w))


class Predictor:
    """Caches one compiled device program per padded input shape."""

    def __init__(self, model, variables, config: CanonicalConfig = CanonicalConfig(),
                 refine: str = "bicubic", suppress_pad_peaks: bool = True,
                 fused_peaks: bool | None = None):
        self.model = model
        self.variables = variables
        self.config = config
        self.refine = refine
        # opt-in single-pass Pallas peak kernel (ops/pallas_kernels.py);
        # None = find_peaks' default (the unfused XLA path)
        self.fused_peaks = fused_peaks
        # invalidate peaks that land in the bucket/letterbox pad band (the
        # reference ORIGINAL path's unpad-before-peaks semantics,
        # parse_skeletons.py:272-281); False reproduces the refactor path,
        # which keeps peaks on the full padded map (evaluate.py:74-80)
        self.suppress_pad_peaks = suppress_pad_peaks
        self._compiled: Dict[Tuple, object] = {}

    # -- device programs ----------------------------------------------------
    def _postprocess(self, avg, img_h, content_hw=None):
        """avg: (h/4, w/4, 50) flip-averaged maps -> (packed, paf, heat).
        ``content_hw``: (2,) float [h, w] valid-content extent in padded-image
        pixels (peaks beyond it are suppressed when enabled)."""
        cfg, icfg = self.config, self.config.infer
        if not self.suppress_pad_peaks:
            content_hw = None
        paf = avg[..., :PAF_LAYERS]
        heat = avg[..., PAF_LAYERS:NUM_LAYERS]
        # refine "bicubicN" (e.g. "bicubic8") = bicubic with an N-times
        # upsample basis: sub-pixel peaks finer than the reference's
        # stride-factor argmax grid
        refine, refine_up = self.refine, None
        if refine.startswith("bicubic") and refine != "bicubic":
            refine_up = int(refine[len("bicubic"):])
            refine = "bicubic"
        peaks = find_peaks(heat[..., :NUM_PARTS], thre=icfg.thre1,
                           max_peaks=icfg.max_peaks, stride=cfg.stride,
                           refine=refine, content_hw=content_hw,
                           refine_upsample=refine_up, fused=self.fused_peaks)
        cand = score_connections(
            paf, peaks.xy, peaks.score, peaks.valid, img_h,
            mid_num=icfg.mid_num, stride=cfg.stride,
            thre2=icfg.thre2, connect_ration=icfg.connect_ration)
        conns = select_connections(cand, peaks.valid)
        return pack_results(peaks, conns), paf, heat

    def _flip_avg_maps(self, variables, imgs):
        """imgs: (B, h, w, 3) float in [0,1] -> (B, h/4, w/4, 50) flip-avg."""
        flip_ord = jnp.asarray(FLIP_CHANNEL_ORD)
        both = jnp.concatenate([imgs, imgs[:, :, ::-1, :]], axis=0)
        outs = self.model.apply(variables, both, train=False)
        out = outs[-1][0]                                  # (2B, h/4, w/4, 50)
        B = imgs.shape[0]
        orig, flip = out[:B], out[B:]
        flip = flip[:, :, ::-1, :][:, :, :, flip_ord]
        return (orig + flip) * 0.5

    def _device_fn(self, h: int, w: int):
        key = ("single", h, w)
        if key not in self._compiled:
            @jax.jit
            def run(variables, img_u8, img_h, content_hw):
                img = img_u8.astype(jnp.float32) / 255.0
                avg = self._flip_avg_maps(variables, img[None])[0]
                return self._postprocess(avg, img_h, content_hw)
            self._compiled[key] = run
        return self._compiled[key]

    def _device_fn_maps(self, h: int, w: int):
        """Forward-only program: uint8 padded image -> flip-averaged
        stride-4 maps (no postprocessing). Used by the split-TTA path
        (tools/eval_tta_split.py), which mirrors the reference's host
        scale loop (parse_skeletons.py:186-281) with one plain device
        program per scaled shape — the robust fallback when a fused
        multi-scale program exceeds the compile service's appetite."""
        key = ("maps", h, w)
        if key not in self._compiled:
            @jax.jit
            def run(variables, img_u8):
                img = img_u8.astype(jnp.float32) / 255.0
                return self._flip_avg_maps(variables, img[None])[0]
            self._compiled[key] = run
        return self._compiled[key]

    def predict_avg_maps(self, img: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int]]:
        """Host API over ``_device_fn_maps``: BGR uint8 image (any size) ->
        (flip-averaged stride-4 maps as numpy (ph/4, pw/4, 50),
        (orig_h, orig_w))."""
        icfg = self.config.infer
        padded, (orig_h, orig_w) = pad_image_to_bucket(
            img, bucket=icfg.max_downsample, pad_value=icfg.pad_value,
            max_hw=(icfg.img_max_h, icfg.img_max_w))
        fn = self._device_fn_maps(*padded.shape[:2])
        maps = fn(self.variables, jnp.asarray(padded))
        return np.asarray(maps), (orig_h, orig_w)

    def _device_fn_tta(self, h: int, w: int, scales: Tuple[float, ...],
                       angles: Tuple[float, ...]):
        """Multi-scale (+rotation) TTA fused into ONE device program: the
        original image is uploaded once; every scale/rotation variant is
        resized/warped, forwarded with its flip pair, and the resulting
        stride-4 maps are cropped back and averaged on device — the
        reference's host loop with cv2 resizes (parse_skeletons.py:196-281)
        collapses into a single XLA graph and a single ~28 KB download."""
        key = ("tta", h, w, scales, angles)
        if key in self._compiled:
            return self._compiled[key]

        from improved_body_parts_tpu.ops.warp import (
            affine_warp, resize_cubic_cv2, rotation_matrix)

        bucket = self.config.infer.max_downsample
        pad_val = self.config.infer.pad_value / 255.0
        base_h4, base_w4 = h // self.config.stride, w // self.config.stride

        @jax.jit
        def run(variables, img_u8, img_h, content_hw):
            img = img_u8.astype(jnp.float32) / 255.0
            acc = jnp.zeros((base_h4, base_w4, NUM_LAYERS), jnp.float32)
            for s in scales:
                sh, sw = int(round(h * s)), int(round(w * s))
                ph = -(-sh // bucket) * bucket
                pw = -(-sw // bucket) * bucket
                img_s = img if s == 1.0 else resize_cubic_cv2(img, sh, sw)
                img_p = jnp.full((ph, pw, 3), pad_val, jnp.float32)
                img_p = img_p.at[:sh, :sw].set(img_s)
                for ang in angles:
                    if ang != 0.0:
                        inv = rotation_matrix((pw / 2.0, ph / 2.0), -ang)
                        x = affine_warp(img_p, inv, fill_value=pad_val)
                    else:
                        x = img_p
                    avg = self._flip_avg_maps(variables, x[None])[0]
                    if ang != 0.0:
                        # the image-space rotation center (pw/2, ph/2) maps to
                        # stride coords via the half-pixel convention
                        cx_s = (pw / 2.0 + 0.5) / self.config.stride - 0.5
                        cy_s = (ph / 2.0 + 0.5) / self.config.stride - 0.5
                        inv_back = rotation_matrix((cx_s, cy_s), ang)
                        avg = affine_warp(avg, inv_back)
                    vh = max(int(round(sh / self.config.stride)), 1)
                    vw = max(int(round(sw / self.config.stride)), 1)
                    valid = avg[:vh, :vw, :]
                    acc = acc + resize_cubic_cv2(valid, base_h4, base_w4)
            avg = acc / float(len(scales) * len(angles))
            return self._postprocess(avg, img_h, content_hw)

        self._compiled[key] = run
        return run

    def _device_fn_batch_tta(self, batch: int, h: int, w: int,
                             scales: Tuple[float, ...],
                             angles: Tuple[float, ...], mesh=None):
        """Batched multi-scale (+rotation) TTA in ONE device program: the
        whole letterboxed batch is resized/rotated per TTA variant, forwarded
        with its flip pair, and the stride-4 maps are cropped back and
        averaged, then vmap-postprocessed — the serving-rate answer to the
        reference's sequential per-image scale loop
        (parse_skeletons.py:186-209). Scales are uniform across the batch
        (letterboxed content height ~= boxsize, so the reference's
        scale*boxsize/img_h multiplier reduces to the scale itself)."""
        mesh_key = (None if mesh is None
                    else tuple(d.id for d in mesh.devices.flat))
        key = ("batch_tta", batch, h, w, scales, angles, mesh_key)
        if key in self._compiled:
            return self._compiled[key]

        from improved_body_parts_tpu.ops.warp import (
            affine_warp, resize_cubic_cv2, rotation_matrix)

        bucket = self.config.infer.max_downsample
        pad_val = self.config.infer.pad_value / 255.0
        stride = self.config.stride
        base_h4, base_w4 = h // stride, w // stride

        def run(variables, imgs_u8, img_hs, content_hws):
            imgs = imgs_u8.astype(jnp.float32) / 255.0
            B = imgs.shape[0]
            acc = jnp.zeros((B, base_h4, base_w4, NUM_LAYERS), jnp.float32)
            for s in scales:
                sh, sw = int(round(h * s)), int(round(w * s))
                ph = -(-sh // bucket) * bucket
                pw = -(-sw // bucket) * bucket
                imgs_s = imgs if s == 1.0 else jax.vmap(
                    lambda im: resize_cubic_cv2(im, sh, sw))(imgs)
                imgs_p = jnp.full((B, ph, pw, 3), pad_val, jnp.float32)
                imgs_p = imgs_p.at[:, :sh, :sw].set(imgs_s)
                for ang in angles:
                    if ang != 0.0:
                        inv = rotation_matrix((pw / 2.0, ph / 2.0), -ang)
                        x = jax.vmap(lambda im: affine_warp(
                            im, inv, fill_value=pad_val))(imgs_p)
                    else:
                        x = imgs_p
                    avg = self._flip_avg_maps(variables, x)
                    if ang != 0.0:
                        cx_s = (pw / 2.0 + 0.5) / stride - 0.5
                        cy_s = (ph / 2.0 + 0.5) / stride - 0.5
                        inv_back = rotation_matrix((cx_s, cy_s), ang)
                        avg = jax.vmap(lambda m: affine_warp(m, inv_back))(avg)
                    vh = max(int(round(sh / stride)), 1)
                    vw = max(int(round(sw / stride)), 1)
                    valid = avg[:, :vh, :vw, :]
                    acc = acc + jax.vmap(lambda m: resize_cubic_cv2(
                        m, base_h4, base_w4))(valid)
            avgs = acc / float(len(scales) * len(angles))
            packed, _, _ = jax.vmap(self._postprocess)(avgs, img_hs,
                                                       content_hws)
            return packed

        if mesh is None:
            self._compiled[key] = jax.jit(run)
        else:
            from jax.sharding import NamedSharding, PartitionSpec
            from improved_body_parts_tpu.parallel.mesh import DATA_AXIS
            data = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
            repl = NamedSharding(mesh, PartitionSpec())
            self._compiled[key] = jax.jit(
                run, in_shardings=(repl, data, data, data),
                out_shardings=data)
        return self._compiled[key]

    def _device_fn_batch(self, batch: int, h: int, w: int, mesh=None):
        """Batched device program; with ``mesh`` the batch axis is sharded
        over the mesh's data axis (serving scale-out: each chip forwards and
        post-processes its batch slice, no cross-chip collectives needed —
        the reference's only multi-GPU inference is torch DataParallel
        scatter/gather, train.py:91)."""
        mesh_key = (None if mesh is None
                    else tuple(d.id for d in mesh.devices.flat))
        key = ("batch", batch, h, w, mesh_key)
        if key not in self._compiled:
            def run(variables, imgs_u8, img_hs, content_hws):
                imgs = imgs_u8.astype(jnp.float32) / 255.0
                avgs = self._flip_avg_maps(variables, imgs)
                packed, _, _ = jax.vmap(self._postprocess)(avgs, img_hs,
                                                           content_hws)
                return packed
            if mesh is None:
                self._compiled[key] = jax.jit(run)
            else:
                from jax.sharding import NamedSharding, PartitionSpec
                from improved_body_parts_tpu.parallel.mesh import DATA_AXIS
                data = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
                repl = NamedSharding(mesh, PartitionSpec())
                self._compiled[key] = jax.jit(
                    run, in_shardings=(repl, data, data, data),
                    out_shardings=data)
        return self._compiled[key]

    def _mesh_variables(self, mesh):
        """Variables replicated over the mesh (cached per device set)."""
        key = ("vars", tuple(d.id for d in mesh.devices.flat))
        if key not in self._compiled:
            from jax.sharding import NamedSharding, PartitionSpec
            repl = NamedSharding(mesh, PartitionSpec())
            self._compiled[key] = jax.tree_util.tree_map(
                lambda x: jax.device_put(np.asarray(x), repl), self.variables)
        return self._compiled[key]

    # -- host API ------------------------------------------------------------
    def predict_maps(self, img: np.ndarray, img_h_override: Optional[float] = None,
                     content_hw_override: Optional[Tuple[float, float]] = None):
        """Run the device program on a BGR uint8 image (any size).
        Returns (packed_device, paf_device, heat_device, (orig_h, orig_w)).
        ``img_h_override`` replaces the limb-length-penalty height and
        ``content_hw_override`` the pad-suppression extent (both used by the
        letterbox path where the content is smaller than the canvas)."""
        icfg = self.config.infer
        padded, (orig_h, orig_w) = pad_image_to_bucket(
            img, bucket=icfg.max_downsample, pad_value=icfg.pad_value,
            max_hw=(icfg.img_max_h, icfg.img_max_w))
        fn = self._device_fn(*padded.shape[:2])
        content = content_hw_override or (orig_h, orig_w)
        packed, paf, heat = fn(self.variables, jnp.asarray(padded),
                               jnp.float32(img_h_override or orig_h),
                               jnp.asarray(content, jnp.float32))
        return packed, paf, heat, (orig_h, orig_w)

    def _group(self, peaks_np: PeakTable, conns_np: Connections,
               use_cpp: Optional[bool]):
        P = self.config.infer.max_peaks
        connected = connections_to_list(conns_np, P, self.config.limbs_conn)
        cands = group.build_joint_candidates(
            peaks_np.xy, peaks_np.score, peaks_np.valid)
        if use_cpp is None or use_cpp:
            # fall back to numpy only when the C++ library is UNAVAILABLE
            # (no compiler); genuine runtime failures must propagate
            try:
                from improved_body_parts_tpu.ops import group_cpp
                available = group_cpp.is_available()
            except Exception:
                available = False
            if available:
                return group_cpp.find_humans(connected, cands, self.config.infer)
            if use_cpp:
                raise RuntimeError("C++ grouping requested but unavailable")
        return group.find_humans(connected, cands, self.config.infer)

    def predict_maps_tta(self, img: np.ndarray,
                         scales: Tuple[float, ...] = (0.5, 1.0, 1.5, 2.0),
                         angles: Tuple[float, ...] = (0.0,),
                         img_h_override: Optional[float] = None,
                         content_hw_override: Optional[Tuple[float, float]] = None):
        """Multi-scale / rotation TTA path. ``scales`` multiply the padded
        input size (the reference scales by boxsize/img_h * scale_search;
        pass those factors here). Returns (packed, paf, heat, (h, w))."""
        icfg = self.config.infer
        padded, (orig_h, orig_w) = pad_image_to_bucket(
            img, bucket=icfg.max_downsample, pad_value=icfg.pad_value,
            max_hw=(icfg.img_max_h, icfg.img_max_w))
        fn = self._device_fn_tta(padded.shape[0], padded.shape[1],
                                 tuple(scales), tuple(angles))
        content = content_hw_override or (orig_h, orig_w)
        packed, paf, heat = fn(self.variables, jnp.asarray(padded),
                               jnp.float32(img_h_override or orig_h),
                               jnp.asarray(content, jnp.float32))
        return packed, paf, heat, (orig_h, orig_w)

    def letterbox(self, img: np.ndarray) -> Tuple[np.ndarray, float]:
        """Scale the longer side to ``boxsize`` and pad to a fixed square —
        ONE compiled program for any input size (vs one per 64-bucket).
        Returns (boxsize x boxsize uint8, scale applied)."""
        import cv2
        size = self.config.infer.boxsize
        h, w = img.shape[:2]
        scale = min(size / h, size / w)
        resized = cv2.resize(img, (int(round(w * scale)), int(round(h * scale))),
                             interpolation=cv2.INTER_CUBIC)
        out = np.full((size, size, 3), self.config.infer.pad_value, np.uint8)
        out[:resized.shape[0], :resized.shape[1]] = resized
        return out, scale

    def predict_skeletons(self, img: np.ndarray, use_cpp: Optional[bool] = None,
                          scales: Optional[Tuple[float, ...]] = None,
                          angles: Tuple[float, ...] = (0.0,),
                          fixed_size: bool = False):
        """Full pipeline -> (keypoints (N,18,3), scores (N,), aux dict).
        Pass ``scales`` for multi-scale TTA (single-scale otherwise);
        ``fixed_size`` letterboxes into one boxsize^2 program (coordinates
        are mapped back to the original image)."""
        unscale = 1.0
        img_h_override = None
        content_hw_override = None
        if fixed_size:
            orig_hw = img.shape[:2]
            img, scale_applied = self.letterbox(img)
            unscale = 1.0 / scale_applied
            img_h_override = orig_hw[0] * scale_applied  # content height
            content_hw_override = (orig_hw[0] * scale_applied,
                                   orig_hw[1] * scale_applied)
        scales_t = tuple(scales) if scales is not None else (1.0,)
        angles_t = tuple(angles)
        if scales_t != (1.0,) or angles_t != (0.0,):
            packed, paf, heat, (orig_h, orig_w) = self.predict_maps_tta(
                img, scales_t, angles_t, img_h_override=img_h_override,
                content_hw_override=content_hw_override)
        else:
            packed, paf, heat, (orig_h, orig_w) = self.predict_maps(
                img, img_h_override=img_h_override,
                content_hw_override=content_hw_override)
        if fixed_size:
            orig_h, orig_w = orig_hw
        buf = np.asarray(packed)              # the single D2H fetch
        peaks_np, conns_np = unpack_results(buf, self.config.infer.max_peaks)
        table, cands = self._group(peaks_np, conns_np, use_cpp)
        kps, scores = group.humans_to_keypoints(table, cands)
        if unscale != 1.0:
            kps[:, :, :2] *= unscale          # letterbox coords -> original
        P = self.config.infer.max_peaks
        aux = dict(paf=paf, heat=heat, peaks=peaks_np, person_table=table,
                   joint_candidates=cands, orig_hw=(orig_h, orig_w),
                   # per-joint-type peaks silently dropped by the top-k cut —
                   # nonzero means max_peaks is saturated on this image
                   peaks_dropped=np.maximum(peaks_np.n_raw - P, 0))
        return kps, scores, aux

    def predict_batch(self, imgs: np.ndarray, img_hs: Optional[np.ndarray] = None,
                      use_cpp: Optional[bool] = None,
                      content_hws: Optional[np.ndarray] = None,
                      mesh=None, scales: Optional[Tuple[float, ...]] = None,
                      angles: Tuple[float, ...] = (0.0,)):
        """Batched path: (B, H, W, 3) uint8, same shape, already letterboxed.
        ``content_hws`` (B, 2) [h, w] per-image valid-content extents (the
        letterbox pad band beyond them is suppressed); default: full canvas.
        With ``mesh`` the batch is sharded over the mesh's data axis — each
        chip runs forward + device postproc on its slice (embarrassingly
        parallel serving scale-out; batch is padded up to a multiple of the
        device count by repeating the last frame, pad results dropped).
        ``scales``/``angles`` run multi-scale/rotation TTA fused into the
        batched program (uniform across the batch — the letterbox canvas
        makes the reference's per-image multiplier collapse to the scale).
        Returns a list of (keypoints, scores) per image."""
        B, h, w = imgs.shape[:3]
        if img_hs is None:
            img_hs = np.full((B,), h, np.float32)
        if content_hws is None:
            content_hws = np.tile(np.float32([h, w]), (B, 1))
        img_hs = np.asarray(img_hs, np.float32)
        content_hws = np.asarray(content_hws, np.float32)
        Bp = B
        if mesh is not None:
            from improved_body_parts_tpu.parallel.mesh import DATA_AXIS
            nd = int(mesh.shape[DATA_AXIS])
            Bp = -(-B // nd) * nd
            if Bp != B:
                reps = [1] * (B - 1) + [Bp - B + 1]
                imgs = np.repeat(imgs, reps, axis=0)
                img_hs = np.repeat(img_hs, reps, axis=0)
                content_hws = np.repeat(content_hws, reps, axis=0)
        scales_t = tuple(scales) if scales is not None else (1.0,)
        angles_t = tuple(angles)
        if scales_t != (1.0,) or angles_t != (0.0,):
            fn = self._device_fn_batch_tta(Bp, h, w, scales_t, angles_t,
                                           mesh=mesh)
        else:
            fn = self._device_fn_batch(Bp, h, w, mesh=mesh)
        variables = (self.variables if mesh is None
                     else self._mesh_variables(mesh))
        packed = fn(variables, jnp.asarray(imgs), jnp.asarray(img_hs),
                    jnp.asarray(content_hws))
        bufs = np.asarray(packed)             # one fetch for the whole batch
        out = []
        P = self.config.infer.max_peaks
        for b in range(B):
            peaks_np, conns_np = unpack_results(bufs[b], P)
            table, cands = self._group(peaks_np, conns_np, use_cpp)
            out.append(group.humans_to_keypoints(table, cands))
        return out

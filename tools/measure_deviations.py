#!/usr/bin/env python
"""Quantify the documented semantic deviations from the reference using the
live oracle harness (NOTES.md "Known semantic choices"):

  1. --refine centroid radius: ours works on the stride map with a 2-CELL
     window (ops/peaks.py _refine_centroid) vs the reference original path's
     2-PIXEL window on the image-resolution upsampled map
     (utils/util.py:188-213). Measured as mean/max peak-coordinate delta.
  2. scale-search quantization: evaluate.py quantizes the reference's
     per-image multipliers (scale * boxsize / img_h) to 1/4 steps to bound
     XLA program count. Measured as stride-map value delta + peak delta of
     quantized vs exact factors through OUR TTA path (the reference's own
     multi-scale accumulation happens at image resolution and its refactor
     path overwrites rather than accumulates — no exact oracle exists).
  3. letterbox vs bucket padding: skeleton coordinate deltas between
     predict_skeletons(fixed_size=True) and the per-image-padding path on
     the same scenes, mapped to original image coords.

Run on CPU (uses the seeded reference-weight recipe; slow but one-off):
    python tools/measure_deviations.py [--scenes 20]
Results go to stdout; paste the summary into NOTES.md.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from improved_body_parts_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def _match_delta(kps_a, kps_b):
    """Greedy nearest matching of two keypoint sets (N,2) -> per-point
    deltas for matched pairs + unmatched counts."""
    if len(kps_a) == 0 or len(kps_b) == 0:
        return np.zeros((0,)), max(len(kps_a), len(kps_b))
    d = np.linalg.norm(kps_a[:, None, :] - kps_b[None, :, :], axis=-1)
    deltas = []
    used_a, used_b = set(), set()
    for _ in range(min(len(kps_a), len(kps_b))):
        i, j = np.unravel_index(np.argmin(d), d.shape)
        if not np.isfinite(d[i, j]):
            break
        deltas.append(d[i, j])
        used_a.add(i)
        used_b.add(j)
        d[i, :] = np.inf
        d[:, j] = np.inf
    unmatched = (len(kps_a) - len(used_a)) + (len(kps_b) - len(used_b))
    return np.asarray(deltas), unmatched


def measure_centroid_radius(n_scenes: int):
    """Deviation 1: centroid refinement radius semantics."""
    import jax.numpy as jnp

    from improved_body_parts_tpu.ops.peaks import find_peaks
    from tests.reference_parity_common import blob_scene

    try:
        import cv2
    except ImportError:
        print("centroid: cv2 unavailable, skipped")
        return

    def reference_original_peaks(heat):
        """The reference original path: x4 cubic upsample -> 3x3 max-pool
        NMS >= thre -> 2 px weighted-centroid refine
        (utils/util.py:177-213, parse_skeletons.py:286-321)."""
        import scipy.ndimage as ndi
        out = []
        up = cv2.resize(heat, None, fx=4, fy=4,
                        interpolation=cv2.INTER_CUBIC)
        for k in range(heat.shape[2]):
            m = up[:, :, k]
            mx = ndi.maximum_filter(m, size=3, mode="reflect")
            ys, xs = np.nonzero((mx == m) & (m >= 0.1))
            pts = []
            for x, y in zip(xs, ys):
                r = 2
                if (x - r < 0 or x + r >= m.shape[1] or y - r < 0
                        or y + r >= m.shape[0]):
                    pts.append((float(x), float(y)))
                    continue
                box = m[y - r:y + r + 1, x - r:x + r + 1]
                grid = np.arange(-r, r + 1, dtype=np.float64)
                tot = box.sum()
                # the reference mgrid swap: x offset from the y moment
                off_x = (box * grid[:, None]).sum() / max(tot, 1e-12)
                off_y = (box * grid[None, :]).sum() / max(tot, 1e-12)
                pts.append((x + off_x, y + off_y))
            out.append(np.asarray(pts).reshape(-1, 2))
        return out

    all_d, unmatched_tot, n_tot = [], 0, 0
    for si in range(200, 200 + n_scenes):
        heat, _, _ = blob_scene(si)
        ref = reference_original_peaks(heat)
        ours = find_peaks(jnp.asarray(heat), thre=0.1, max_peaks=64,
                          stride=4, refine="centroid")
        xy, va = np.asarray(ours.xy), np.asarray(ours.valid)
        for k in range(heat.shape[2]):
            d, um = _match_delta(ref[k], xy[k][va[k]])
            all_d.extend(d)
            unmatched_tot += um
            n_tot += max(len(ref[k]), int(va[k].sum()))
    all_d = np.asarray(all_d)
    print(f"centroid-refine radius: {len(all_d)} matched peaks over "
          f"{n_scenes} scenes; mean |delta| {all_d.mean():.3f} px, "
          f"p95 {np.percentile(all_d, 95):.3f} px, max {all_d.max():.3f} px, "
          f"unmatched {unmatched_tot}/{n_tot}")


def _seeded_predictor():
    sys.path.insert(0, "/root/reference")
    from tests.test_reference_parity import (
        _import_reference, _our_predictor_from_sd, _seeded_reference_net)
    _import_reference()
    net, sd = _seeded_reference_net()
    return _our_predictor_from_sd(sd)


def measure_scale_quantization(n_scenes: int):
    """Deviation 2: 1/4-step quantization of the per-image TTA factors."""
    predictor = _seeded_predictor()
    rng = np.random.RandomState(3)
    scale_search = [0.5, 1.0, 1.5]
    boxsize = 512
    map_deltas, peak_deltas, unmatched = [], [], 0
    for si in range(n_scenes):
        ih = int(rng.randint(90, 140))
        iw = int(rng.randint(100, 180))
        img = rng.randint(0, 255, (ih, iw, 3)).astype(np.uint8)
        exact = tuple(sorted({min(s * boxsize / ih, 2.0)
                              for s in scale_search}))
        quant = tuple(sorted({max(round(s * 4) / 4, 0.25) for s in exact}))
        pk_e, paf_e, heat_e, _ = predictor.predict_maps_tta(img, exact)
        pk_q, paf_q, heat_q, _ = predictor.predict_maps_tta(img, quant)
        map_deltas.append(float(np.abs(np.asarray(heat_e) -
                                       np.asarray(heat_q)).mean()))
        from improved_body_parts_tpu.infer.predict import unpack_results
        P = predictor.config.infer.max_peaks
        pe, _ = unpack_results(np.asarray(pk_e), P)
        pq, _ = unpack_results(np.asarray(pk_q), P)
        for k in range(18):
            d, um = _match_delta(pe.xy[k][pe.valid[k]],
                                 pq.xy[k][pq.valid[k]])
            peak_deltas.extend(d)
            unmatched += um
    peak_deltas = np.asarray(peak_deltas) if peak_deltas else np.zeros(1)
    print(f"scale quantization (exact vs 1/4-step, {n_scenes} images): "
          f"mean |map delta| {np.mean(map_deltas):.5f}, "
          f"peak mean |delta| {peak_deltas.mean():.3f} px, "
          f"p95 {np.percentile(peak_deltas, 95):.3f} px, "
          f"unmatched peaks {unmatched}")


def measure_letterbox(n_scenes: int):
    """Deviation 3: letterbox canvas vs per-image bucket padding."""
    predictor = _seeded_predictor()
    rng = np.random.RandomState(4)
    deltas, unmatched = [], 0
    for si in range(n_scenes):
        ih = int(rng.randint(90, 140))
        iw = int(rng.randint(100, 180))
        img = rng.randint(0, 255, (ih, iw, 3)).astype(np.uint8)
        kps_pad, sc_pad, _ = predictor.predict_skeletons(img)
        kps_box, sc_box, _ = predictor.predict_skeletons(img, fixed_size=True)
        a = kps_pad[:, :, :2][kps_pad[:, :, 2] > 0] if len(kps_pad) else \
            np.zeros((0, 2))
        b = kps_box[:, :, :2][kps_box[:, :, 2] > 0] if len(kps_box) else \
            np.zeros((0, 2))
        d, um = _match_delta(a, b)
        deltas.extend(d)
        unmatched += um
    deltas = np.asarray(deltas) if deltas else np.zeros(1)
    print(f"letterbox vs bucket padding ({n_scenes} images): joint mean "
          f"|delta| {deltas.mean():.3f} px, p95 "
          f"{np.percentile(deltas, 95):.3f} px, unmatched joints {unmatched}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=20)
    ap.add_argument("--which", default="all",
                    choices=["all", "centroid", "scale", "letterbox"])
    args = ap.parse_args()
    if args.which in ("all", "centroid"):
        measure_centroid_radius(args.scenes)
    if args.which in ("all", "scale"):
        measure_scale_quantization(max(args.scenes // 2, 5))
    if args.which in ("all", "letterbox"):
        measure_letterbox(max(args.scenes // 2, 5))

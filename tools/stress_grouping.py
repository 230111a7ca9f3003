#!/usr/bin/env python
"""Stress the postproc + host-grouping path at COCO-crowd scale.

VERDICT round-1 weak #4: the host assembly cost was only measured on a
2-person scene, and ``lax.top_k`` silently drops peaks beyond P=max_peaks.
This tool builds N-person synthetic scenes (full 18-joint skeletons on
512^2-class stride maps), runs the real device postproc (find_peaks ->
score_connections -> select_connections), and measures:

  * host grouping ms/frame, numpy and C++ paths
    (reference counterpart: pafprocess.cpp:26-309, capacity constants
    pafprocess.h:6-17 — NMS_MAX_PEAKS=64, MAX_HUMANS=128, silently capped);
  * top-k saturation: raw NMS peaks vs the P-slot tables (peaks.n_raw);
  * persons recovered vs ground truth.

Usage: python tools/stress_grouping.py [--tpu] [--people 2 8 15 20 32]
Writes one JSON line per scene size to stdout; human summary to stderr.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_crowd_scene(n_people: int, H: int = 128, W: int = 128,
                     seed: int = 0):
    """N full-skeleton people on (H, W) stride maps.

    People are placed on a jittered grid so crowding is dense but peaks stay
    mostly resolvable — the COCO-crowd regime. Returns (paf (H,W,30),
    heat (H,W,18), joints (N,18,2) stride coords)."""
    from improved_body_parts_tpu.configs import LIMBS_CONN, NUM_PARTS, PAF_LAYERS
    from improved_body_parts_tpu.data.synthetic import _TEMPLATE
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_postproc import gaussian_blob, limb_band

    rng = np.random.RandomState(seed)
    cols = int(np.ceil(np.sqrt(n_people)))
    rows = int(np.ceil(n_people / cols))
    heat = np.zeros((H, W, NUM_PARTS), np.float32)
    paf = np.zeros((H, W, PAF_LAYERS), np.float32)
    joints = np.zeros((n_people, NUM_PARTS, 2), np.float32)
    for i in range(n_people):
        r, c = divmod(i, cols)
        cell_h, cell_w = H / rows, W / cols
        cy = (r + 0.5) * cell_h + rng.uniform(-0.1, 0.1) * cell_h
        cx = (c + 0.5) * cell_w + rng.uniform(-0.1, 0.1) * cell_w
        scale = min(cell_h, cell_w) * rng.uniform(0.7, 0.95)
        pts = (_TEMPLATE - [0.5, 0.5]) * scale + [cx, cy]
        pts += rng.normal(0, 0.3, pts.shape)
        pts[:, 0] = np.clip(pts[:, 0], 1, W - 2)
        pts[:, 1] = np.clip(pts[:, 1], 1, H - 2)
        joints[i] = pts
        for j in range(NUM_PARTS):
            heat[:, :, j] = np.maximum(
                heat[:, :, j], gaussian_blob((H, W), pts[j, 0], pts[j, 1],
                                             sigma=1.2))
        for li, (fr, to) in enumerate(LIMBS_CONN):
            paf[:, :, li] = np.maximum(
                paf[:, :, li],
                limb_band((H, W), pts[fr, 0], pts[fr, 1],
                          pts[to, 0], pts[to, 1], sigma=1.0))
    return paf, heat, joints


def run_scene(n_people: int, iters: int, seed: int = 0):
    import jax.numpy as jnp

    from improved_body_parts_tpu.configs import CanonicalConfig
    from improved_body_parts_tpu.ops import group, group_cpp
    from improved_body_parts_tpu.ops.limbs import (
        connections_to_numpy, score_connections, select_connections)
    from improved_body_parts_tpu.ops.peaks import find_peaks

    config = CanonicalConfig()
    icfg = config.infer
    paf, heat, joints = make_crowd_scene(n_people, seed=seed)
    peaks = find_peaks(jnp.asarray(heat), thre=icfg.thre1,
                       max_peaks=icfg.max_peaks, stride=config.stride)
    cand = score_connections(jnp.asarray(paf), peaks.xy, peaks.score,
                             peaks.valid, jnp.float32(512.0),
                             mid_num=icfg.mid_num, stride=config.stride,
                             thre2=icfg.thre2,
                             connect_ration=icfg.connect_ration)
    conns = select_connections(cand, peaks.valid)
    connected = connections_to_numpy(conns, peaks)
    n_conns = int(sum(len(c) for c in connected))

    peaks_xy = np.asarray(peaks.xy)
    peaks_score = np.asarray(peaks.score)
    peaks_valid = np.asarray(peaks.valid)
    n_raw = np.asarray(peaks.n_raw)
    dropped = int(np.maximum(n_raw - icfg.max_peaks, 0).sum())

    def time_grouper(grouper):
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            c = group.build_joint_candidates(peaks_xy, peaks_score, peaks_valid)
            table, jc = grouper(connected, c, icfg)
            group.humans_to_keypoints(table, jc)
            times.append(time.perf_counter() - t0)
        return float(np.median(times)), table

    np_ms, np_table = time_grouper(group.find_humans)
    if group_cpp.is_available():
        cpp_ms, cpp_table = time_grouper(group_cpp.find_humans)
        assert len(cpp_table) == len(np_table), "numpy/C++ person-count drift"
    else:
        cpp_ms = float("nan")
    return {
        "people": n_people,
        "raw_peaks_total": int(n_raw.sum()),
        "peaks_dropped": dropped,
        "max_raw_per_type": int(n_raw.max()),
        "P": icfg.max_peaks,
        "connections": n_conns,
        "persons_found": int(len(np_table)),
        "group_numpy_ms": round(np_ms * 1e3, 3),
        "group_cpp_ms": round(cpp_ms * 1e3, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--people", type=int, nargs="+",
                    default=[2, 8, 15, 20, 32])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tpu", action="store_true",
                    help="run the device postproc on the TPU (default cpu)")
    args = ap.parse_args()

    if not args.tpu:
        os.environ.setdefault("XLA_FLAGS", "")
        os.environ.pop("JAX_PLATFORMS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")

    for n in args.people:
        stats = run_scene(n, args.iters)
        print(json.dumps(stats), flush=True)
        sys.stderr.write(
            f"people={stats['people']:3d} raw={stats['raw_peaks_total']:4d} "
            f"dropped={stats['peaks_dropped']:3d} conns={stats['connections']:4d} "
            f"found={stats['persons_found']:3d} "
            f"numpy={stats['group_numpy_ms']:.2f}ms "
            f"cpp={stats['group_cpp_ms']:.2f}ms\n")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Stage-by-stage device timing of the inference postproc at 512^2.

Times each stage (NMS, top-k, refine, limb scoring, greedy select, full
_postprocess) by chaining N dispatches and syncing once (the tunnel makes
per-dispatch timing meaningless — utils/profiling.sync). Used to decide
what to fuse into Pallas (VERDICT round-1 next #8: refine was the largest
cost at 6.5 ms / 8 frames in round 1).

Usage: python tools/profile_postproc.py [--iters 16] [--hw 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from improved_body_parts_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--hw", type=int, default=128, help="stride-map size")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from improved_body_parts_tpu.configs import CanonicalConfig, NUM_PARTS
    from improved_body_parts_tpu.ops.limbs import (
        score_connections, select_connections)
    from improved_body_parts_tpu.ops.peaks import find_peaks
    from improved_body_parts_tpu.utils.profiling import sync

    config = CanonicalConfig()
    icfg = config.infer
    hw = args.hw

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from stress_grouping import make_crowd_scene
    paf_np, heat_np, _ = make_crowd_scene(8, H=hw, W=hw)
    heat = jnp.asarray(heat_np)
    paf = jnp.asarray(paf_np)

    from improved_body_parts_tpu.ops.pallas_kernels import nms

    @jax.jit
    def stage_nms(h):
        return nms(jnp.moveaxis(h, -1, 0), icfg.thre1, footprint="plus")

    @jax.jit
    def stage_topk(h):
        from jax import lax
        nm = nms(jnp.moveaxis(h, -1, 0), icfg.thre1, footprint="plus")
        flat = nm.reshape(NUM_PARTS, hw * hw)
        return lax.top_k(flat, icfg.max_peaks)

    @jax.jit
    def stage_peaks(h):
        return find_peaks(h, thre=icfg.thre1, max_peaks=icfg.max_peaks,
                          stride=config.stride)

    @jax.jit
    def stage_peaks_fused(h):
        return find_peaks(h, thre=icfg.thre1, max_peaks=icfg.max_peaks,
                          stride=config.stride, fused=True)

    @jax.jit
    def stage_full(h, p):
        peaks = find_peaks(h, thre=icfg.thre1, max_peaks=icfg.max_peaks,
                           stride=config.stride)
        cand = score_connections(p, peaks.xy, peaks.score, peaks.valid,
                                 jnp.float32(512.0), mid_num=icfg.mid_num,
                                 stride=config.stride, thre2=icfg.thre2,
                                 connect_ration=icfg.connect_ration)
        conns = select_connections(cand, peaks.valid)
        return peaks.score, conns.score

    def timeit(name, fn, *xs):
        out = fn(*xs)      # compile
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*xs)
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:24s} {dt*1e3:8.3f} ms")
        return dt

    t_nms = timeit("nms", stage_nms, heat)
    t_topk = timeit("nms+topk", stage_topk, heat)
    t_peaks = timeit("find_peaks(+refine)", stage_peaks, heat)
    try:
        timeit("find_peaks FUSED", stage_peaks_fused, heat)
    except Exception as e:  # Mosaic lowering not validated yet
        print(f"fused path failed: {type(e).__name__}: {str(e)[:200]}")
    t_full = timeit("full postproc", stage_full, heat, paf)
    print(f"{'-> topk alone':24s} {(t_topk-t_nms)*1e3:8.3f} ms")
    print(f"{'-> refine alone':24s} {(t_peaks-t_topk)*1e3:8.3f} ms")
    print(f"{'-> limbs+select alone':24s} {(t_full-t_peaks)*1e3:8.3f} ms")
    print(f"(platform: {jax.devices()[0].platform}, map {hw}x{hw}, "
          f"P={icfg.max_peaks})")


if __name__ == "__main__":
    main()

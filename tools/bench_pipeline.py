#!/usr/bin/env python
"""Measure the host data-pipeline throughput at full 512^2 resolution.

VERDICT round-1 weak #5: the real augmentation + heatmapper path was only
ever timed at 256^2 synthetic, never against the 512^2 train-step demand
(measured this round: ~2 samples/s/chip at bs8 over the tunnel — see
NOTES.md honesty correction). This tool builds a reference-format h5
(coco_masks_hdf5.py:270-314 layout) with multi-person 512^2-class records,
then times:

  * one synchronous CocoH5Dataset.__getitem__ (per-stage: h5 read+decode,
    affine warp, heatmapper);
  * PrefetchingLoader.batches at several worker counts.

The reference's DataLoader gets ~40 samples/s/process (README.md:50).
NOTE: this box has ONE CPU core — absolute numbers here are a lower bound;
report per-worker scaling and the single-sample latency, which transfer to
a real many-core TPU host.

Usage: python tools/bench_pipeline.py [--records 24] [--steps 6] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from improved_body_parts_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def write_crowd_h5(path: str, n_records: int, img_hw=(480, 640),
                   people_per_img=4, seed: int = 0):
    """Reference-layout h5 with multi-person records (COCO-17 joints)."""
    import h5py

    from improved_body_parts_tpu.data.synthetic import _TEMPLATE

    # canonical template -> COCO-17 order (drop neck, reorder face/limbs):
    # coco17 = [nose, Leye, Reye, Lear, Rear, Lsho, Rsho, Lelb, Relb,
    #           Lwri, Rwri, Lhip, Rhip, Lkne, Rkne, Lank, Rank]
    canon_to_coco17 = [0, 15, 14, 17, 16, 5, 2, 6, 3, 7, 4, 11, 8, 12, 9, 13, 10]
    rng = np.random.RandomState(seed)
    H, W = img_hw
    with h5py.File(path, "w") as f:
        data_grp = f.create_group("dataset")
        img_grp = f.create_group("images")
        mask_grp = f.create_group("masks")
        for r in range(n_records):
            key = f"{r:012d}"
            img = rng.randint(0, 255, (H, W, 3), np.uint8)
            mask_miss = np.full((H, W), 255, np.uint8)
            mask_all = np.zeros((H, W), np.uint8)
            n_people = rng.randint(1, people_per_img + 1)
            joints, objpos, scales = [], [], []
            for _ in range(n_people):
                s = rng.uniform(0.35, 0.8) * H
                cx = rng.uniform(0.25, 0.75) * W
                cy = rng.uniform(0.25, 0.75) * H
                pts = (_TEMPLATE - [0.5, 0.5]) * s + [cx, cy]
                j17 = np.zeros((17, 3))
                for c17, canon in enumerate(canon_to_coco17):
                    j17[c17, :2] = pts[canon]
                    j17[c17, 2] = 1.0
                joints.append(j17.tolist())
                objpos.append([float(cx), float(cy)])
                scales.append(float(s / 512.0))
                y0, y1 = int(max(cy - s / 2, 0)), int(min(cy + s / 2, H))
                x0, x1 = int(max(cx - s / 3, 0)), int(min(cx + s / 3, W))
                mask_all[y0:y1, x0:x1] = 255
            meta = {"image": key, "joints": joints,
                    "objpos": objpos, "scale_provided": scales}
            img_grp.create_dataset(key, data=img)
            mask_grp.create_dataset(
                key, data=np.stack([mask_miss, mask_all], axis=2))
            ds = data_grp.create_dataset(f"{r:07d}", data=json.dumps(meta))
            ds.attrs["meta"] = json.dumps(meta)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=24)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4, 6])
    ap.add_argument("--h5", type=str, default="/tmp/bench_pipeline_512.h5")
    ap.add_argument("--compact", action="store_true",
                    help="compact samples for --feed compact: the host skips "
                         "GT rasterization entirely (heatmaps render "
                         "in-graph, data/heatmaps_device.py)")
    args = ap.parse_args()

    from improved_body_parts_tpu.configs import CanonicalConfig
    from improved_body_parts_tpu.data.pipeline import CocoH5Dataset
    from improved_body_parts_tpu.data.prefetch import PrefetchingLoader

    if not os.path.exists(args.h5):
        t0 = time.perf_counter()
        write_crowd_h5(args.h5, args.records)
        sys.stderr.write(f"wrote {args.h5} in {time.perf_counter()-t0:.1f}s\n")

    config = CanonicalConfig()  # 512x512
    ds = CocoH5Dataset(args.h5, config, augment=True)

    # single-sample latency with stage breakdown
    rng = np.random.RandomState(0)
    ds[0]  # warm h5 cache
    lat = []
    for i in range(8):
        t0 = time.perf_counter()
        r = np.random.RandomState(rng.randint(2**31))
        if args.compact:
            ds.get_compact(i % len(ds), r)
        else:
            ds.__getitem__(i % len(ds), r)
        lat.append(time.perf_counter() - t0)
    lat_ms = float(np.median(lat) * 1e3)
    sys.stderr.write(f"single-sample latency {lat_ms:.1f} ms "
                     f"(-> {1e3/lat_ms:.1f} samples/s/worker)\n")

    results = {"single_sample_ms": round(lat_ms, 1)}
    for w in args.workers:
        loader = PrefetchingLoader(ds, num_workers=w)
        it = loader.batches(args.batch, args.steps, seed=1,
                            compact=args.compact)
        next(it)  # exclude ramp-up of the first batch
        t0 = time.perf_counter()
        n = 0
        for imgs, _, _ in it:
            n += len(imgs)
        dt = time.perf_counter() - t0
        sps = n / dt
        results[f"samples_per_s_w{w}"] = round(sps, 1)
        sys.stderr.write(f"workers={w}: {n} samples in {dt:.1f}s "
                         f"= {sps:.1f} samples/s\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()

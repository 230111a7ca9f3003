#!/usr/bin/env python
"""Multi-scale TTA evaluation with one PLAIN device program per scale —
the reference's host scale loop (reference utils/parse_skeletons.py:186-281:
per-scale cv2 resize -> forward -> resize maps back -> average), used as
the robust A/B arm when the fused multi-scale program
(Predictor._device_fn_tta) exceeds the remote compile service's limits
(observed: a 4-scale fused program containing a 1024^2 forward dies with
'remote_compile: response body closed'; the per-scale programs compile
fine).

Accuracy-equivalent to the fused path by construction (the fused program is
oracle-locked against exactly this composition, tests/test_reference_parity
fused-TTA host mirror); this loop pays ~4 extra map downloads per image,
which only matters for throughput, not AP.

Usage:
    python tools/eval_tta_split.py --checkpoint <ckpt> \
        --image-dir .../images --gt-json .../gt.json \
        --scale-search 0.5 1 1.5 2 --dump-name r5_tta4split
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


def split_tta_maps(predictor, img, factors):
    """Per-scale forward + host cv2 map resize -> flip-averaged stride-4
    maps on the base padded grid. Mirrors Predictor._device_fn_tta's math
    with one plain device program per scaled shape (the input resize runs
    on uint8 where the fused program resizes float [0,1] — a <=1/510
    per-pixel quantization). Returns (avg_maps (bh4, bw4, 50), orig_hw)."""
    import cv2

    from improved_body_parts_tpu.infer.predict import pad_image_to_bucket

    cfg = predictor.config
    stride, bucket = cfg.stride, cfg.infer.max_downsample
    padded, orig_hw = pad_image_to_bucket(img, bucket=bucket,
                                          pad_value=cfg.infer.pad_value)
    ph, pw = padded.shape[:2]
    bh4, bw4 = ph // stride, pw // stride
    acc = np.zeros((bh4, bw4, 50), np.float32)
    for f in factors:
        sh, sw = int(round(ph * f)), int(round(pw * f))
        scaled = (padded if f == 1.0 else
                  cv2.resize(padded, (sw, sh),
                             interpolation=cv2.INTER_CUBIC))
        maps, _ = predictor.predict_avg_maps(scaled)
        vh = max(int(round(sh / stride)), 1)
        vw = max(int(round(sw / stride)), 1)
        acc += cv2.resize(maps[:vh, :vw], (bw4, bh4),
                          interpolation=cv2.INTER_CUBIC)
    return acc / len(factors), orig_hw


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config", default="Canonical")
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--gt-json", default="")
    ap.add_argument("--scale-search", type=float, nargs="+",
                    default=[0.5, 1.0, 1.5, 2.0])
    ap.add_argument("--scale-quant", type=int, default=4,
                    help="same semantics as evaluate.py --scale-quant")
    ap.add_argument("--refine", default="bicubic")
    ap.add_argument("--dump-name", default="tta_split")
    ap.add_argument("--max-images", type=int, default=-1)
    args = ap.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp

    from demo_image import build_predictor
    from evaluate import AverageMeter, append_result
    from improved_body_parts_tpu.infer.predict import unpack_results
    from improved_body_parts_tpu.ops import group

    predictor = build_predictor(args.checkpoint, args.config, args.refine)
    cfg = predictor.config
    stride, bucket = cfg.stride, cfg.infer.max_downsample
    boxsize = cfg.infer.boxsize

    names = sorted(n for n in os.listdir(args.image_dir)
                   if n.lower().endswith((".jpg", ".jpeg", ".png")))
    gt_data = None
    if args.gt_json:
        with open(args.gt_json) as f:
            gt_data = json.load(f)
        by_name = {im["file_name"]: im["id"] for im in gt_data["images"]}
        images = [(by_name[n], os.path.join(args.image_dir, n))
                  for n in names if n in by_name]
    else:
        images = [(i, os.path.join(args.image_dir, n))
                  for i, n in enumerate(names)]
    if args.max_images > 0:
        images = images[:args.max_images]
    print(f"evaluating {len(images)} images "
          f"(split-TTA scales {args.scale_search})")

    post_fns = {}

    def post_fn(h4, w4):
        if (h4, w4) not in post_fns:
            @jax.jit
            def run(maps, img_h, content_hw):
                return predictor._postprocess(maps, img_h, content_hw)[0]
            post_fns[(h4, w4)] = run
        return post_fns[(h4, w4)]

    meter = AverageMeter()
    all_outputs = []
    for n, (image_id, path) in enumerate(images):
        img = cv2.imread(path)
        if img is None:
            continue
        t0 = time.time()
        h, w = img.shape[:2]
        # reference protocol (parse_skeletons.py:186): multiplier =
        # scale * boxsize / img_h, optionally quantized (evaluate.py)
        q = args.scale_quant
        factors = sorted({
            max(round(s * boxsize / h * q) / q, 0.25) if q > 0
            else s * boxsize / h
            for s in args.scale_search})
        avg, _ = split_tta_maps(predictor, img, factors)
        bh4, bw4 = avg.shape[:2]
        packed = post_fn(bh4, bw4)(jnp.asarray(avg), jnp.float32(h),
                                   jnp.asarray([h, w], np.float32))
        peaks_np, conns_np = unpack_results(np.asarray(packed),
                                            cfg.infer.max_peaks)
        table, cands = predictor._group(peaks_np, conns_np, None)
        kps, scores = group.humans_to_keypoints(table, cands)
        meter.update(time.time() - t0)
        append_result(image_id, kps, scores, all_outputs)
        if n % 50 == 0:
            print(f"[{n}/{len(images)}] {1/max(meter.avg,1e-9):.2f} FPS avg")

    out = f"results/val2017_{args.dump_name}_results.json"
    os.makedirs("results", exist_ok=True)
    with open(out, "w") as f:
        json.dump(all_outputs, f)
    print(f"wrote {len(all_outputs)} detections to {out} "
          f"(avg {1/max(meter.avg,1e-9):.2f} FPS)")
    if gt_data is not None and all_outputs:
        from improved_body_parts_tpu.utils.oks_eval import KeypointEval
        stats = KeypointEval(gt_data, all_outputs,
                             img_ids=[i for i, _ in images]).run()
        print(f"AP={stats[0]:.4f} AP50={stats[1]:.4f} AP75={stats[2]:.4f} "
              f"APM={stats[3]:.4f} APL={stats[4]:.4f} AR={stats[5]:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

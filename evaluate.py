#!/usr/bin/env python
"""COCO keypoint evaluation (CLI-compatible successor of the reference
evaluate.py:235-332).

Iterates val2017 (or test-dev) person images, runs the TPU pipeline per
image, converts CMU-order keypoints to COCO order, writes
``results/<name>_results.json`` and, when pycocotools is installed, runs
COCOeval. Without annotations, ``--image-dir`` evaluates every image in a
directory and just writes the detections json (plus an FPS meter).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from improved_body_parts_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

NUM_COCO_KEYPOINTS = 17


class AverageMeter:
    """Running average speed meter (reference evaluate.py:286-302)."""

    def __init__(self):
        self.val = self.sum = self.count = self.avg = 0.0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def to_coco_keypoints(kps: np.ndarray) -> np.ndarray:
    """(18,3) CMU-order -> (17,3) COCO-order. reference: evaluate.py:40,169."""
    from improved_body_parts_tpu.configs import ORDER_COCO
    return kps[ORDER_COCO, :]


def append_result(image_id, kps_list, scores, all_outputs):
    """reference: evaluate.py:182-232 (refactor-path branch)."""
    for kps, score in zip(kps_list, scores):
        coco_kps = to_coco_keypoints(kps)
        out = np.zeros((NUM_COCO_KEYPOINTS, 3), np.float64)
        out[:, :2] = coco_kps[:, :2]
        out[:, 2] = (coco_kps[:, 2] > 0).astype(np.float64)
        all_outputs.append({
            "image_id": int(image_id),
            "category_id": 1,
            "keypoints": [float(x) for x in out.reshape(-1)],
            "score": float(score),
        })


def main():
    parser = argparse.ArgumentParser(description="PoseNet evaluation (TPU-native)")
    parser.add_argument("--checkpoint", "-p", default="", help="orbax dir or torch .pth")
    parser.add_argument("--config", default="Canonical")
    parser.add_argument("--coco-dir", default="data/dataset/coco",
                        help="COCO root (annotations/ + val2017/)")
    parser.add_argument("--subset", default="val2017", choices=["val2017", "test2017"])
    parser.add_argument("--image-dir", default="", help="plain image directory mode")
    parser.add_argument("--gt-json", default="",
                        help="COCO-format keypoint GT json to score against "
                             "(with --image-dir; e.g. from "
                             "tools/make_synthetic_coco.py)")
    parser.add_argument("--max-images", type=int, default=-1)
    parser.add_argument("--dump-name", default="tpu_imhn")
    parser.add_argument("--run_cpp", action="store_true")
    parser.add_argument("--show_eval_speed", action="store_true")
    parser.add_argument("--scale-search", type=float, nargs="*", default=None,
                        help="multi-scale TTA factors (reference INI scale_search)")
    parser.add_argument("--scale-quant", type=int, default=4,
                        help="quantize per-image scale multipliers to 1/N "
                             "steps to bound the XLA program count (default "
                             "1/4). 0 = reference-exact per-image factors "
                             "(parse_skeletons.py:186) — one compile per "
                             "unique image height, amortized by the "
                             "persistent compilation cache")
    parser.add_argument("--letterbox", action="store_true",
                        help="fixed boxsize^2 letterbox (one XLA program for "
                             "all image sizes; slight AP trade for speed)")
    parser.add_argument("--boxsize", type=int, default=0,
                        help="override the model's boxsize (reference INI "
                             "'boxsize', utils/config) — the letterbox canvas "
                             "and scale normalization target. Match it to the "
                             "checkpoint's training resolution: letterboxing "
                             "small images onto a larger canvas UPSCALES them, "
                             "which an off-scale model fragments into spurious "
                             "detections")
    parser.add_argument("--pipeline", type=int, default=0, metavar="DEPTH",
                        help="with --letterbox: run the evaluation through "
                             "PipelinedServer with DEPTH overlapping device "
                             "dispatches (serving-rate throughput instead of "
                             "single-image latency)")
    parser.add_argument("--pipeline-batch", type=int, default=8)
    parser.add_argument("--refine", default="bicubic",
                        choices=["bicubic", "centroid", "none"],
                        help="peak sub-pixel refinement scheme (bicubic = "
                             "reference-exact; centroid = legacy "
                             "original-path alternative, ops/peaks.py)")
    parser.add_argument("--rotation-search", type=float, nargs="*",
                        default=None, metavar="DEG",
                        help="rotation TTA angles (reference INI "
                             "rotation_search; fused into the same device "
                             "program as --scale-search)")
    parser.add_argument("--quantize", default="", choices=["", "int8"],
                        help="post-training int8 quantization of the "
                             "forward (models/quantize.py): BN folded, "
                             "per-channel weight scales, calibrated "
                             "activation scales — 2x MXU rate on v5e")
    args = parser.parse_args()
    if args.pipeline and not args.letterbox:
        parser.error("--pipeline requires --letterbox")

    import cv2

    from demo_image import build_predictor
    predictor = build_predictor(args.checkpoint, args.config, args.refine,
                                quantize=args.quantize)
    if args.boxsize:
        import dataclasses
        predictor.config = dataclasses.replace(
            predictor.config,
            infer=dataclasses.replace(predictor.config.infer,
                                      boxsize=args.boxsize))

    # gather image list -------------------------------------------------
    # gt_data: COCO-format dict scored by the in-repo OKS/AP evaluator
    # (utils/oks_eval.py) when pycocotools is absent; coco_gt: pycocotools
    # COCO object when it is importable (preferred, reference
    # evaluate.py:274-280 behaviour)
    coco_gt = None
    gt_data = None
    if args.image_dir:
        names = sorted(os.listdir(args.image_dir))
        images = [(i, os.path.join(args.image_dir, n)) for i, n in enumerate(names)
                  if n.lower().endswith((".jpg", ".jpeg", ".png"))]
        if args.gt_json:
            with open(args.gt_json) as f:
                gt_data = json.load(f)
            by_name = {im["file_name"]: im["id"] for im in gt_data["images"]}
            images = [(by_name[os.path.basename(p)], p) for _, p in images
                      if os.path.basename(p) in by_name]
    else:
        if args.subset == "val2017":
            ann_file = os.path.join(args.coco_dir, "annotations",
                                    "person_keypoints_val2017.json")
        else:
            ann_file = os.path.join(args.coco_dir, "annotations",
                                    "image_info_test-dev2017.json")
        if not os.path.exists(ann_file):
            print(f"annotations not found: {ann_file}", file=sys.stderr)
            return 2
        try:
            from pycocotools.coco import COCO
            coco_gt = COCO(ann_file)
            cat_ids = coco_gt.getCatIds(catNms=["person"])
            img_ids = coco_gt.getImgIds(catIds=cat_ids)
            file_names = {i: coco_gt.imgs[i]["file_name"] for i in img_ids}
        except ImportError:
            # pycocotools-free path: read the annotation json directly and
            # score with the vendored evaluator
            with open(ann_file) as f:
                gt_data = json.load(f)
            person_ids = {c["id"] for c in gt_data.get("categories", [])
                          if c.get("name") == "person"} or {1}
            img_ids = sorted({a["image_id"]
                              for a in gt_data.get("annotations", [])
                              if a.get("category_id", 1) in person_ids}) or \
                sorted(im["id"] for im in gt_data["images"])
            file_names = {im["id"]: im["file_name"]
                          for im in gt_data["images"]}
        images = [(i, os.path.join(args.coco_dir, args.subset, file_names[i]))
                  for i in img_ids]

    if args.max_images > 0:
        images = images[:args.max_images]
    print(f"evaluating {len(images)} images")

    meter = AverageMeter()
    all_outputs = []
    if args.pipeline:
        # serving-rate evaluation: decode + submit with backpressure while
        # DEPTH device dispatches stay in flight (the reference loop is
        # strictly sequential, evaluate.py:262-267)
        from improved_body_parts_tpu.infer.serving import PipelinedServer
        # letterboxed content height ~= boxsize, so the reference's
        # per-image multiplier (scale * boxsize / img_h) reduces to the
        # scale itself — TTA variants fuse into the batched device program
        pipe_scales = tuple(args.scale_search) if args.scale_search else None
        pipe_angles = (tuple(args.rotation_search) if args.rotation_search
                       else (0.0,))
        serve = PipelinedServer(predictor, batch_size=args.pipeline_batch,
                                depth=args.pipeline,
                                use_cpp=True if args.run_cpp else None,
                                scales=pipe_scales, angles=pipe_angles)
        # compile the batch program before the clock starts (first XLA
        # compile is minutes over the tunnel and would swamp the FPS meter)
        size = predictor.config.infer.boxsize
        warm = np.zeros((args.pipeline_batch, size, size, 3), np.uint8)
        predictor.predict_batch(warm, scales=pipe_scales, angles=pipe_angles)
        t0 = time.time()
        futs = []
        for image_id, path in images:
            img = cv2.imread(path)
            if img is None:
                print(f"skip unreadable {path}")
                continue
            futs.append((image_id, serve.submit(img)))   # blocks when full
        for n, (image_id, fut) in enumerate(futs):
            kps, scores = fut.result()
            append_result(image_id, kps, scores, all_outputs)
        serve.close()
        if futs:
            meter.update((time.time() - t0) / len(futs), n=len(futs))
        images = [(i, None) for i, _ in futs]    # scored image ids below
    else:
      for n, (image_id, path) in enumerate(images):
        img = cv2.imread(path)
        if img is None:
            print(f"skip unreadable {path}")
            continue
        t0 = time.time()
        scales = None
        if args.scale_search:
            if args.letterbox:
                # letterboxed content height ~= boxsize, so the reference's
                # multiplier = scale * boxsize / img_h reduces to scale itself
                scales = tuple(args.scale_search)
            else:
                # reference protocol (parse_skeletons.py:186): normalize by
                # boxsize/img_h; quantize to 1/N steps to bound XLA programs
                # (--scale-quant 0 keeps the exact per-image factors)
                boxsize = predictor.config.infer.boxsize
                q = args.scale_quant
                scales = tuple(sorted({
                    max(round(s * boxsize / img.shape[0] * q) / q, 0.25)
                    if q > 0 else s * boxsize / img.shape[0]
                    for s in args.scale_search}))
        kps, scores, _ = predictor.predict_skeletons(
            img, use_cpp=True if args.run_cpp else None,
            scales=scales, fixed_size=args.letterbox,
            angles=tuple(args.rotation_search) if args.rotation_search
            else (0.0,))
        meter.update(time.time() - t0)
        append_result(image_id, kps, scores, all_outputs)
        if args.show_eval_speed and n % 50 == 0:
            print(f"[{n}/{len(images)}] {1/meter.val:.2f} ({1/meter.avg:.2f}) FPS")

    results_file = f"results/{args.subset}_{args.dump_name}_results.json"
    os.makedirs(os.path.dirname(results_file), exist_ok=True)
    with open(results_file, "w") as f:
        json.dump(all_outputs, f)
    print(f"wrote {len(all_outputs)} detections to {results_file} "
          f"(avg {1/meter.avg:.2f} FPS)" if meter.count else f"wrote {results_file}")

    if coco_gt is not None and all_outputs:
        from pycocotools.cocoeval import COCOeval
        coco_dt = coco_gt.loadRes(results_file)
        ev = COCOeval(coco_gt, coco_dt, "keypoints")
        ev.params.imgIds = [i for i, _ in images]
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
    elif gt_data is not None and all_outputs:
        from improved_body_parts_tpu.utils.oks_eval import KeypointEval
        stats = KeypointEval(gt_data, all_outputs,
                             img_ids=[i for i, _ in images]).run()
        print(f"AP={stats[0]:.4f} AP50={stats[1]:.4f} AP75={stats[2]:.4f} "
              f"APM={stats[3]:.4f} APL={stats[4]:.4f} AR={stats[5]:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

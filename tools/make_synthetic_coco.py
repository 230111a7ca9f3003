#!/usr/bin/env python
"""Render held-out synthetic scenes as an image directory + COCO-format
keypoint GT json, closing the train -> evaluate -> AP loop without the real
COCO dataset (reference protocol: evaluate.py:235-280 over val2017).

Usage:
    python tools/make_synthetic_coco.py --out-dir /tmp/syncoco --n-images 64
    python evaluate.py --checkpoint <ckpt> --image-dir /tmp/syncoco/images \
        --gt-json /tmp/syncoco/gt.json

The GT follows the real annotation schema (images / annotations /
categories, 17 COCO-order keypoints, area, bbox, num_keypoints, iscrowd) so
the same json also scores under pycocotools when that is installed.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cmu_to_coco_gt(joints: np.ndarray) -> np.ndarray:
    """(18, 3) CMU-order canonical joints -> (17, 3) COCO-order with COCO
    visibility coding (2 = labeled+visible). Canonical visibility: 1=visible
    (configs.convert_coco_joints); the neck (idx 1) is synthesized and has
    no COCO counterpart."""
    from improved_body_parts_tpu.configs import ORDER_COCO
    out = joints[ORDER_COCO].copy()
    out[:, 2] = np.where(joints[ORDER_COCO, 2] <= 1, 2.0, 0.0)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--n-images", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--sizes", type=int, nargs="*", default=None,
                    help="cycle these image sizes per scene (variable-size "
                         "set: exercises per-image scale factors, e.g. the "
                         "--scale-quant deviation A/B)")
    ap.add_argument("--seed", type=int, default=777,
                    help="held-out seed family (training uses seed*100003+i "
                         "streams; pick a seed unused by training)")
    ap.add_argument("--max-people", type=int, default=3)
    args = ap.parse_args(argv)

    import cv2

    from improved_body_parts_tpu.data.synthetic import (
        random_people, render_image)

    img_dir = os.path.join(args.out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for i in range(args.n_images):
        rng = np.random.RandomState(args.seed * 100003 + i)
        H = W = args.sizes[i % len(args.sizes)] if args.sizes else args.size
        joints = random_people(rng, H, W, max_people=args.max_people)
        img = render_image(joints, H, W, rng)
        name = f"synthetic_{i:06d}.png"
        cv2.imwrite(os.path.join(img_dir, name),
                    (img * 255).astype(np.uint8))
        images.append({"id": i, "file_name": name, "width": W, "height": H})
        for person in joints:
            coco = cmu_to_coco_gt(person)
            xs, ys = coco[:, 0], coco[:, 1]
            x0, y0 = float(xs.min()), float(ys.min())
            bw, bh = float(xs.max() - x0), float(ys.max() - y0)
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": 1,
                "keypoints": [round(float(v), 2) for v in coco.reshape(-1)],
                "num_keypoints": int((coco[:, 2] > 0).sum()),
                "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1

    gt = {"images": images, "annotations": annotations,
          "categories": [{
              "id": 1, "name": "person", "supercategory": "person",
              "keypoints": ["nose", "left_eye", "right_eye", "left_ear",
                            "right_ear", "left_shoulder", "right_shoulder",
                            "left_elbow", "right_elbow", "left_wrist",
                            "right_wrist", "left_hip", "right_hip",
                            "left_knee", "right_knee", "left_ankle",
                            "right_ankle"]}]}
    gt_path = os.path.join(args.out_dir, "gt.json")
    with open(gt_path, "w") as f:
        json.dump(gt, f)
    print(f"wrote {len(images)} images to {img_dir} and "
          f"{len(annotations)} annotations to {gt_path}")


if __name__ == "__main__":
    main()

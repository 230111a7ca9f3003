#!/usr/bin/env python
"""AP-vs-epoch curve over the kept per-epoch checkpoints of one training
run: restores each epoch's (params, batch_stats) into a single compiled
Predictor program (the device program depends only on shapes, so weight
swaps are free) and scores the same held-out image set with the in-repo OKS
evaluator — the plateau evidence for the full-recipe training leg
(reference context: 52-epoch released recipe, config/config.py:21-22).

Usage:
    python tools/eval_curve.py --ckpt-root /root/ckpt512_r4 \
        --image-dir /root/eval_syn512/images --gt-json /root/eval_syn512/gt.json \
        --epochs 1 3 5 7 9 11 13 15 17 19 21 23 --swa
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-root", required=True,
                    help="train.py -p dir (contains orbax/ and orbax_swa/)")
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--epochs", type=int, nargs="+", required=True)
    ap.add_argument("--swa", action="store_true",
                    help="also score the SWA-averaged model (orbax_swa)")
    ap.add_argument("--config", default="Canonical")
    ap.add_argument("--out-json", default="",
                    help="write the curve as one json list")
    args = ap.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp

    from evaluate import append_result
    from improved_body_parts_tpu.configs import get_config
    from improved_body_parts_tpu.infer.predict import Predictor
    from improved_body_parts_tpu.models.imhn import create_model
    from improved_body_parts_tpu.utils.checkpoint import restore_train_state
    from improved_body_parts_tpu.utils.oks_eval import KeypointEval

    config = get_config(args.config)
    model = create_model(config.model, dtype=jnp.bfloat16)

    with open(args.gt_json) as f:
        gt_data = json.load(f)
    by_name = {im["file_name"]: im["id"] for im in gt_data["images"]}
    images = sorted(
        (by_name[n], os.path.join(args.image_dir, n))
        for n in os.listdir(args.image_dir) if n in by_name)
    decoded = [(i, cv2.imread(p)) for i, p in images]
    img_ids = [i for i, _ in images]
    print(f"{len(decoded)} images, epochs {args.epochs}"
          f"{' + swa' if args.swa else ''}")

    arms = [(f"epoch{e}", os.path.join(args.ckpt_root, "orbax"), e)
            for e in args.epochs]
    if args.swa:
        arms.append(("swa", os.path.join(args.ckpt_root, "orbax_swa"), None))

    predictor = None
    curve = []
    for name, ckpt_dir, step in arms:
        try:
            state = restore_train_state(ckpt_dir, step=step)
        except (FileNotFoundError, KeyError) as e:
            print(f"{name}: skip ({e})")
            continue
        variables = {"params": state["params"],
                     "batch_stats": state["batch_stats"]}
        if predictor is None:
            predictor = Predictor(model, variables, config)
        else:
            predictor.variables = jax.device_put(variables)
        dets = []
        t0 = time.time()
        for image_id, img in decoded:
            kps, scores, _ = predictor.predict_skeletons(img)
            append_result(image_id, kps, scores, dets)
        dt = time.time() - t0
        stats = KeypointEval(gt_data, dets, img_ids=img_ids).run()
        row = dict(arm=name, ap=round(stats[0], 4), ap50=round(stats[1], 4),
                   ap75=round(stats[2], 4), ar=round(stats[5], 4),
                   n_dets=len(dets), seconds=round(dt, 1))
        curve.append(row)
        print(json.dumps(row))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(curve, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

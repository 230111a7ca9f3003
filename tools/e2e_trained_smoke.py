#!/usr/bin/env python
"""End-to-end trained-checkpoint smoke: train -> checkpoint -> detect.

Renders HELD-OUT synthetic scenes (seeds the training never saw), runs the
full device pipeline with a trained checkpoint, and scores detection
quality: per-joint localisation error vs the known ground truth and the
person count. The quantitative closure of the train->checkpoint->infer
loop that COCO AP would normally provide (blocked: no dataset/weights in
this image — VERDICT round-1 next #6).

Usage: python tools/e2e_trained_smoke.py --checkpoint /tmp/ck512/orbax \
           [--image-size 512] [--scenes 3] [--seed 777]
Exit code 0 iff every scene's people are all found with mean joint error
below --tol pixels.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from improved_body_parts_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--tol", type=float, default=10.0,
                    help="max acceptable mean joint error (pixels)")
    ap.add_argument("--config", default="Canonical")
    args = ap.parse_args()

    import dataclasses

    import jax.numpy as jnp

    from improved_body_parts_tpu.configs import get_config
    from improved_body_parts_tpu.data.synthetic import (
        random_people, render_image)
    from improved_body_parts_tpu.infer.predict import Predictor
    from improved_body_parts_tpu.models.imhn import create_model
    from improved_body_parts_tpu.utils.checkpoint import load_for_inference

    config = get_config(args.config)
    if args.image_size != config.height:
        config = dataclasses.replace(config, width=args.image_size,
                                     height=args.image_size)
    model = create_model(config.model, dtype=jnp.bfloat16)
    variables = load_for_inference(args.checkpoint, model)
    predictor = Predictor(model, variables, config)

    S = args.image_size
    ok = True
    for si in range(args.scenes):
        rng = np.random.RandomState(args.seed + si)
        joints = random_people(rng, S, S, max_people=2)
        img = (render_image(joints, S, S, rng) * 255).astype(np.uint8)
        kps, scores, aux = predictor.predict_skeletons(img)

        # match each GT person to its nearest detection by mean joint dist
        errs = []
        for gt in joints:
            best = None
            for det in kps:
                vis = det[:, 2] > 0
                if vis.sum() < 4:
                    continue
                d = np.linalg.norm(det[vis, :2] - gt[vis, :2], axis=1).mean()
                best = d if best is None else min(best, d)
            errs.append(best)
        found = sum(e is not None and e < args.tol for e in errs)
        mean_err = np.mean([e for e in errs if e is not None]) if any(
            e is not None for e in errs) else float("inf")
        status = "OK" if found == len(joints) else "MISS"
        print(f"scene {si}: {len(joints)} people, matched {found}, "
              f"mean joint err {mean_err:.2f}px, detections {len(kps)}, "
              f"dropped_peaks {int(aux['peaks_dropped'].sum())}  [{status}]")
        ok &= found == len(joints)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
